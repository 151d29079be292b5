"""Pipeline control plane: Tracking, LocalMapping, LoopClosing, GridMapping.

Host-side orchestration mirroring the reference's four concurrent threads
(/root/reference/src/System.cc:129-164) over jitted device steps. Runs either
synchronously (deterministic, for tests) or with background workers.
"""
