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
        # default is the 10^6-word L6 tree (scripts/train_vocab_l6.py, the
        # reference's shipped scale, KeyFrame.cc:64-66); L5/L4 are fallbacks
        assert pr.voc.n_words in (1_000_000, 100_000, 10_000)
        assert pr.voc.k == 10

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


class TestOrbvocTextFormat:
    """DBoW2 ORBvoc.txt interop (TemplatedVocabulary.h:1351-1463)."""

    def test_round_trip_complete_tree(self, small_voc, rng, tmp_path):
        from orb_slam2_2021_tpu.place.vocab import load_orbvoc_text, save_orbvoc_text

        path = str(tmp_path / "voc.txt")
        save_orbvoc_text(small_voc, path)
        back = load_orbvoc_text(path)
        assert (back.k, back.L) == (small_voc.k, small_voc.L)
        np.testing.assert_array_equal(back.node_desc, small_voc.node_desc)
        np.testing.assert_allclose(back.word_idf, small_voc.word_idf, rtol=1e-5)
        descs = rng.integers(0, 2**32, (300, 8), dtype=np.uint32)
        np.testing.assert_array_equal(back.transform_np(descs),
                                      small_voc.transform_np(descs))

    def test_incomplete_tree(self, rng, tmp_path):
        """DBoW2 trees may stop early (cluster < k): nodes with fewer than k
        children and leaves above depth L must load and descend
        deterministically, with each word on exactly one leaf slot."""
        from orb_slam2_2021_tpu.place.vocab import load_orbvoc_text

        # hand-built k=3, L=2 tree: root has 3 children; child A has 3 leaf
        # children, child B only 2, child C is itself an early leaf.
        # Descriptors are clustered (A≈0x00, B≈0x55, C≈0xFF with leaves a
        # couple of bits off their parent) so greedy descent of each leaf
        # descriptor provably reaches that leaf.
        k = 3
        lines = [f"{k} 2 0 0"]
        descs = np.zeros((9, 32), np.int64)
        descs[0, :] = 0x00                      # A
        descs[1, :] = 0x55                      # B
        descs[2, :] = 0xFF                      # C
        for i in range(3):                      # A's leaves
            descs[3 + i] = descs[0]
            descs[3 + i, 0] = i + 1
        for i in range(2):                      # B's leaves
            descs[6 + i] = descs[1]
            descs[6 + i, 0] = 0x54 + 3 * i

        def node(parent, leaf, d, w):
            return f"{parent} {int(leaf)} " + " ".join(map(str, d)) + f" {w}"

        lines.append(node(0, 0, descs[0], 0))       # node 1 = A
        lines.append(node(0, 0, descs[1], 0))       # node 2 = B
        lines.append(node(0, 1, descs[2], 0.7))     # node 3 = C (early leaf)
        for i in range(3):                          # A's leaves: nodes 4-6
            lines.append(node(1, 1, descs[3 + i], 0.1 * (i + 1)))
        for i in range(2):                          # B's leaves: nodes 7-8
            lines.append(node(2, 1, descs[6 + i], 0.5 + 0.1 * i))
        path = str(tmp_path / "incomplete.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

        voc = load_orbvoc_text(path)
        assert voc.k == 3 and voc.L == 2

        # each real leaf descriptor must land on a distinct word with its
        # own idf weight
        leaf_descs = np.asarray(descs[3:8], np.uint8).reshape(5, 32).view(np.uint32)
        c_desc = np.asarray(descs[2], np.uint8).reshape(1, 32).view(np.uint32)
        words = voc.transform_np(np.vstack([leaf_descs, c_desc]))
        assert len(set(words.tolist())) == 6
        np.testing.assert_allclose(
            voc.word_idf[words],
            [0.1, 0.2, 0.3, 0.5, 0.6, 0.7], rtol=1e-5)

        # device descent agrees with numpy on random queries
        q = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
        fn = make_transform_fn(voc.k, voc.L)
        w_dev = np.asarray(fn(jnp.asarray(voc.node_desc), jnp.asarray(q),
                              jnp.ones(64, bool)))
        np.testing.assert_array_equal(w_dev, voc.transform_np(q))

    def test_from_file_txt_dispatch(self, small_voc, tmp_path):
        from orb_slam2_2021_tpu.place.vocab import save_orbvoc_text

        path = str(tmp_path / "voc.txt")
        save_orbvoc_text(small_voc, path)
        pr = PlaceRecognition.from_file(path)
        assert pr.voc.n_words == small_voc.n_words

    def test_rejects_garbage(self, tmp_path):
        from orb_slam2_2021_tpu.place.vocab import load_orbvoc_text

        path = str(tmp_path / "bad.txt")
        with open(path, "w") as f:
            f.write("999 99 9 9\n")
        with pytest.raises(ValueError):
            load_orbvoc_text(path)
