"""Out-of-distribution place recognition: the packaged vocabulary (trained on
SyntheticStereoWorld seeds 100-123, scripts/train_vocab.py) must still
discriminate places on worlds it never saw — different seeds, different
texture statistics (posterized, different texture scale).

This is the held-out recall check the reference never needed (it ships a
10^6-word ORBvoc trained on real imagery); ours guards against the
vocabulary only working in-distribution."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_2021_tpu.config import synthetic_config, OrbConfig
from orb_slam2_2021_tpu.frontend.features import make_extract_fn
from orb_slam2_2021_tpu.io.synthetic import SyntheticStereoWorld
from orb_slam2_2021_tpu.place.bundle import PlaceRecognition
from orb_slam2_2021_tpu.place.kf_database import KeyFrameDatabase
from orb_slam2_2021_tpu.place.vocab import bow_vector, l1_score

N_WORLDS = 5


@pytest.fixture(scope="module")
def heldout_words():
    """For each held-out world: BoW words of a database view and of a query
    view a small baseline away (same place, different frame)."""
    pr = PlaceRecognition.load_default()
    assert pr is not None, "packaged vocabulary missing"
    cfg = synthetic_config(width=320, height=240).replace(
        orb=OrbConfig(n_features=1024, n_levels=4)
    )
    extract = make_extract_fn(cfg.orb)

    def words_of(img):
        kp = extract(jnp.asarray(img))
        w = np.asarray(pr.transform(kp.desc, kp.valid))
        return w[w >= 0]

    db, queries = [], []
    eye = np.eye(3, dtype=np.float32)
    for i in range(N_WORLDS):
        # held-out: unseen seeds AND a shifted texture family (posterized,
        # coarser texture scale than the training worlds' tex_scale=4)
        world = SyntheticStereoWorld(cfg, seed=1000 + i, tex_scale=2)
        lo, hi = world.texture.min(), world.texture.max()
        world.texture = lo + np.round((world.texture - lo) / max(hi - lo, 1e-6) * 5) / 5 * (hi - lo)
        left_db, _ = world.render(eye, np.zeros(3, np.float32))
        left_q, _ = world.render(eye, np.array([0.25, 0.05, 0.1], np.float32))
        db.append(words_of(left_db))
        queries.append(words_of(left_q))
    return pr, db, queries


class TestHeldOutRecall:
    def test_bow_scores_separate_places(self, heldout_words):
        """Same-place score must beat every cross-place score for most
        worlds (recall >= 0.8 on 5 held-out worlds)."""
        pr, db, queries = heldout_words
        voc = pr.voc
        vecs = [bow_vector(w, voc.word_idf, voc.n_words) for w in db]
        hits = 0
        margins = []
        for i, q in enumerate(queries):
            qv = bow_vector(q, voc.word_idf, voc.n_words)
            scores = [l1_score(qv[0], qv[1], v[0], v[1]) for v in vecs]
            if int(np.argmax(scores)) == i:
                hits += 1
            cross = [s for j, s in enumerate(scores) if j != i]
            margins.append(scores[i] - max(cross))
        assert hits >= N_WORLDS - 1, f"recall {hits}/{N_WORLDS}"
        assert np.mean(margins) > 0.02, f"weak separation: {margins}"

    def test_reloc_candidates_on_heldout(self, heldout_words):
        """The KeyFrameDatabase reloc policy surfaces the right keyframe for
        a held-out query (DetectRelocalizationCandidates semantics)."""
        pr, db, queries = heldout_words
        kfdb = KeyFrameDatabase(pr.voc)
        for k, w in enumerate(db):
            kfdb.add(k, w)
        hits = 0
        for i, q in enumerate(queries):
            cands = kfdb.detect_reloc_candidates(q, lambda x: [])
            if cands and cands[0] == i:
                hits += 1
        assert hits >= N_WORLDS - 1, f"reloc recall {hits}/{N_WORLDS}"
