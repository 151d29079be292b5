"""Place recognition tests: vocabulary descent, BoW scoring, keyframe
database candidate policies, BoW relocalization (SURVEY.md §2 #12, #14)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_2021_tpu.place.vocab import (
    BinaryVocabulary, train_vocabulary, make_transform_fn, bow_vector, l1_score,
)
from orb_slam2_2021_tpu.place.kf_database import KeyFrameDatabase
from orb_slam2_2021_tpu.place.bundle import PlaceRecognition


@pytest.fixture(scope="module")
def small_voc(request):
    rng = np.random.default_rng(7)
    descs = rng.integers(0, 2**32, (4000, 8), dtype=np.uint32)
    return train_vocabulary(descs, k=6, L=3, seed=1)


class TestVocabulary:
    def test_device_matches_numpy(self, small_voc, rng):
        descs = rng.integers(0, 2**32, (256, 8), dtype=np.uint32)
        w_np = small_voc.transform_np(descs)
        fn = make_transform_fn(small_voc.k, small_voc.L)
        w_dev = np.asarray(
            fn(jnp.asarray(small_voc.node_desc), jnp.asarray(descs), jnp.ones(256, bool))
        )
        np.testing.assert_array_equal(w_dev, w_np)

    def test_invalid_get_minus_one(self, small_voc, rng):
        descs = rng.integers(0, 2**32, (8, 8), dtype=np.uint32)
        valid = np.zeros(8, bool)
        valid[:4] = True
        fn = make_transform_fn(small_voc.k, small_voc.L)
        w = np.asarray(fn(jnp.asarray(small_voc.node_desc), jnp.asarray(descs), jnp.asarray(valid)))
        assert (w[4:] == -1).all() and (w[:4] >= 0).all()

    def test_same_descriptor_same_word(self, small_voc, rng):
        d = rng.integers(0, 2**32, (1, 8), dtype=np.uint32)
        descs = np.repeat(d, 5, axis=0)
        w = small_voc.transform_np(descs)
        assert (w == w[0]).all()

    def test_packaged_vocab_loads(self):
        pr = PlaceRecognition.load_default()
        assert pr is not None, "packaged vocabulary missing"
        assert pr.voc.n_words == 10000

    def test_l1_score_identical(self, small_voc, rng):
        words = rng.integers(0, small_voc.n_words, 100)
        w, v = bow_vector(words, small_voc.word_idf, small_voc.n_words)
        assert abs(l1_score(w, v, w, v) - 1.0) < 1e-5

    def test_l1_score_disjoint(self, small_voc):
        w1, v1 = bow_vector(np.arange(0, 50), small_voc.word_idf, small_voc.n_words)
        w2, v2 = bow_vector(np.arange(100, 150), small_voc.word_idf, small_voc.n_words)
        assert l1_score(w1, v1, w2, v2) == 0.0


class TestKFDatabase:
    def _db_with(self, voc, frames):
        db = KeyFrameDatabase(voc)
        for k, words in frames.items():
            db.add(k, words)
        return db

    def test_reloc_candidates_prefer_similar(self, small_voc, rng):
        base = rng.integers(0, small_voc.n_words, 120)
        # kf 0 shares 90% of words with the query; kf 1 shares ~10%
        q = base.copy()
        f0 = base.copy()
        f0[:12] = rng.integers(0, small_voc.n_words, 12)
        f1 = rng.integers(0, small_voc.n_words, 120)
        db = self._db_with(small_voc, {0: f0, 1: f1})
        cands = db.detect_reloc_candidates(q, lambda x: [])
        assert cands and cands[0] == 0

    def test_loop_candidates_exclude_connected(self, small_voc, rng):
        base = rng.integers(0, small_voc.n_words, 120)
        db = self._db_with(small_voc, {0: base, 1: base, 2: base})
        # query kf=2; kf1 is covisible (excluded); kf0 should surface
        cands = db.detect_loop_candidates(2, 0.0, {1}, lambda x: [])
        assert 0 in cands and 1 not in cands

    def test_erase_removes(self, small_voc, rng):
        base = rng.integers(0, small_voc.n_words, 120)
        db = self._db_with(small_voc, {0: base, 1: base})
        db.erase(0)
        cands = db.detect_loop_candidates(1, 0.0, set(), lambda x: [])
        assert 0 not in cands
