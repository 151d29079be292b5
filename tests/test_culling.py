"""Culled-keyframe semantics: mTcp trajectory resolution + database erase.

Reference behavior:
- KeyFrame::SetBadFlag stores the relative pose to the parent at cull time
  (/root/reference/src/KeyFrame.cc:556) and the trajectory savers walk
  `while (pKF->isBad()) Trw = Trw * pKF->mTcp; pKF = pKF->GetParent()`
  (/root/reference/src/System.cc:418-420, 510-513) so frames referencing a
  culled KF still export poses that follow later loop/GBA corrections.
- SetBadFlag also erases the KF from the KeyFrameDatabase inverted file
  (/root/reference/src/KeyFrame.cc:561 -> KeyFrameDatabase.cc:49-66) so dead
  KFs never come back as loop/reloc candidates.
"""

import numpy as np

from orb_slam2_2021_tpu.config import synthetic_config
from orb_slam2_2021_tpu.mapping.map_store import MapStore


def _mat(R, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _make_map(n_kf=3):
    cfg = synthetic_config(width=64, height=48)
    m = MapStore(cfg)
    N = cfg.orb.n_features
    rng = np.random.default_rng(0)
    for k in range(n_kf):
        R = _yaw(0.1 * k)
        t = np.array([0.5 * k, 0, 0], np.float32)
        xy = rng.uniform(0, 40, (N, 2)).astype(np.float32)
        neg = np.full(N, -1.0, np.float32)
        valid = np.ones(N, bool)
        bind = np.full(N, -1, np.int64)
        m.add_keyframe(R, t, xy, neg, neg, np.zeros(N, np.int32),
                       np.zeros(N, np.float32),
                       rng.integers(0, 2**32, (N, 8), dtype=np.uint32),
                       valid, bind, frame_id=k, timestamp=float(k))
        if k > 0:
            m._set_parent(k, k - 1)
    return cfg, m


def test_mtcp_resolves_culled_kf_through_corrected_ancestor():
    cfg, m = _make_map(3)
    # ground truth: camera poses before the correction
    T1 = _mat(m.kf_R[1], m.kf_t[1])
    T0 = _mat(m.kf_R[0], m.kf_t[0])
    rel_10 = T1 @ np.linalg.inv(T0)  # true T_1<-w * T_w<-0

    T2 = _mat(m.kf_R[2], m.kf_t[2])
    rel_20 = T2 @ np.linalg.inv(T0)

    m.erase_keyframe(1)
    assert not m.kf_valid[1]
    assert 1 in m.culled_tcp
    # cull 2 as well (it was reparented onto 0 when 1 died)
    m.erase_keyframe(2)

    # large loop-style correction applied to the live ancestor AFTER the
    # culls (a real CorrectLoop updates every live KF; culled ones must
    # follow through their stored relative poses)
    corr = _mat(_yaw(0.5), np.array([3.0, -1.0, 2.0], np.float32))
    T0_new = T0 @ corr
    m.kf_R[0] = T0_new[:3, :3]
    m.kf_t[0] = T0_new[:3, 3]

    resolved = m.resolve_kf_pose(1)
    expected = rel_10 @ T0_new  # the culled KF must follow its ancestor
    np.testing.assert_allclose(resolved, expected, atol=1e-5)

    resolved2 = m.resolve_kf_pose(2)
    np.testing.assert_allclose(resolved2, rel_20 @ T0_new, atol=1e-4)

    # live KFs resolve to their own pose unchanged
    np.testing.assert_allclose(m.resolve_kf_pose(0), T0_new, atol=1e-6)


def test_trajectory_export_follows_correction_through_culled_ref_kf():
    from orb_slam2_2021_tpu.pipeline.tracking import FrameRecord, Tracking

    cfg, m = _make_map(2)
    tr = Tracking(cfg, m)
    # a frame whose reference KF is 1, at relative pose T_cr
    T_cr = _mat(_yaw(0.05), np.array([0.1, 0, 0], np.float32))
    tr.records.append(FrameRecord(7, 0.7, 1, T_cr, False))
    T1 = _mat(m.kf_R[1], m.kf_t[1])
    T0 = _mat(m.kf_R[0], m.kf_t[0])
    rel_10 = T1 @ np.linalg.inv(T0)

    m.erase_keyframe(1)
    corr = _mat(_yaw(-0.3), np.array([0, 2.0, 0], np.float32))
    T0_new = T0 @ corr
    m.kf_R[0] = T0_new[:3, :3]
    m.kf_t[0] = T0_new[:3, 3]

    (_, Twc), = tr.trajectory()
    expected = np.linalg.inv(T_cr @ rel_10 @ T0_new)
    np.testing.assert_allclose(Twc, expected, atol=1e-4)


def test_culled_kf_erased_from_keyframe_database():
    from orb_slam2_2021_tpu.place.kf_database import KeyFrameDatabase
    from orb_slam2_2021_tpu.place.vocab import BinaryVocabulary

    cfg, m = _make_map(3)
    voc = BinaryVocabulary(
        2, 2, np.zeros((7, 8), np.uint32), np.ones(4, np.float32)
    )
    kfdb = KeyFrameDatabase(voc)
    m.on_kf_erased = kfdb.erase  # the System wiring under test

    rng = np.random.default_rng(1)
    for k in range(3):
        words = rng.integers(0, 4, 64).astype(np.int32)
        kfdb.add_bow(k, words)
        kfdb.add_to_index(k)
    assert 1 in kfdb.bow

    m.erase_keyframe(1)
    assert 1 not in kfdb.bow
    assert all(1 not in lst for lst in kfdb.inverted.values())
    # reloc candidates can never include the culled KF
    cands = kfdb.detect_reloc_candidates(
        rng.integers(0, 4, 64).astype(np.int32), lambda x: []
    )
    assert 1 not in cands
