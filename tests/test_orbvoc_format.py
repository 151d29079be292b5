"""DBoW2 ORBvoc.txt interop: the text loader must accept files in the exact
format the reference writes (TemplatedVocabulary::saveToTextFile,
/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1416-1436) and
reproduce DBoW2's descent semantics (loadFromTextFile, :1351-1412) — including
incomplete trees (nodes with fewer than k children) and early leaves (leaf
nodes above depth L), which real DBoW2 vocabularies contain whenever a
training cluster ran out of descriptors.

Word NUMBERING differs by design: DBoW2 assigns word ids in file order of the
leaf lines; our complete-layout tree numbers the depth-L leaf slots. The
contract tested here is the one that matters for retrieval: the PARTITION of
descriptor space is identical (two descriptors share a DBoW2 word iff they
share a loaded word), and each word keeps its idf weight."""

import numpy as np
import pytest

from orb_slam2_2021_tpu.place.vocab import (
    BinaryVocabulary,
    load_orbvoc_text,
    save_orbvoc_text,
    train_vocabulary,
)


def _rand_descs(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def _desc_to_text(d):
    """F::toString for FORB: 32 space-separated uint8s."""
    return " ".join(str(int(b)) for b in np.asarray(d).view(np.uint8))


class DBoW2Reference:
    """Minimal faithful reimplementation of DBoW2's loadFromTextFile +
    transform (TemplatedVocabulary.h:1351-1412, :135-153) used as the test
    oracle: explicit children lists, descend by Hamming argmin over the ACTUAL
    children (first minimum wins), word ids in file order of leaf lines."""

    def __init__(self, path):
        with open(path) as f:
            header = f.readline().split()
            self.k, self.L = int(header[0]), int(header[1])
            self.children = {0: []}
            self.desc = {0: np.zeros(8, np.uint32)}
            self.weight = {}
            self.word_of_node = {}
            nid = 0
            for line in f:
                parts = line.split()
                if len(parts) < 35:
                    continue
                nid += 1
                pid = int(parts[0])
                is_leaf = int(parts[1]) > 0
                self.children.setdefault(pid, []).append(nid)
                self.children[nid] = []
                self.desc[nid] = (
                    np.asarray([int(x) for x in parts[2:34]], np.uint8)
                    .view(np.uint32)
                )
                self.weight[nid] = float(parts[34])
                if is_leaf:
                    self.word_of_node[nid] = len(self.word_of_node)

    def transform(self, d):
        node = 0
        while self.children[node]:
            cs = self.children[node]
            dists = [
                bin(int.from_bytes(
                    (np.bitwise_xor(self.desc[c], d)).tobytes(), "little"
                )).count("1")
                for c in cs
            ]
            node = cs[int(np.argmin(dists))]
        return self.word_of_node[node]


def _write_dbow2_fixture(path, rng):
    """Hand-build a small DBoW2-shaped vocabulary file k=3, L=2 with the
    irregularities real files contain: an incomplete branch (2 of 3 children)
    and an early leaf at depth 1. Node lines in DBoW2 m_nodes order (parents
    before children), header with saveToTextFile's double space."""
    d = {n: _rand_descs(rng, 1)[0] for n in range(1, 9)}
    lines = []
    # depth-1 children of root: nodes 1 (internal), 2 (internal), 3 EARLY LEAF
    lines.append(("0 0", d[1], 0.0))
    lines.append(("0 0", d[2], 0.0))
    lines.append(("0 1", d[3], 0.7))          # early leaf above depth L
    # children of node 1: full fan-out, leaves
    lines.append(("1 1", d[4], 0.3))
    lines.append(("1 1", d[5], 0.9))
    lines.append(("1 1", d[6], 0.2))
    # children of node 2: INCOMPLETE (2 of 3), leaves
    lines.append(("2 1", d[7], 0.5))
    lines.append(("2 1", d[8], 0.4))
    with open(path, "w") as f:
        f.write("3 2  0 0\n")  # saveToTextFile writes k L <space><space>s w
        for head, desc, w in lines:
            f.write(f"{head} {_desc_to_text(desc)} {w}\n")
    return d


def test_loader_matches_dbow2_semantics(tmp_path):
    rng = np.random.default_rng(11)
    path = str(tmp_path / "mini_orbvoc.txt")
    _write_dbow2_fixture(path, rng)

    oracle = DBoW2Reference(path)
    voc = load_orbvoc_text(path)
    assert voc.k == 3 and voc.L == 2

    qs = _rand_descs(rng, 512)
    ours = voc.transform_np(qs)
    theirs = np.asarray([oracle.transform(q) for q in qs])

    # identical partition of descriptor space (bijection between labelings)
    pairs = set(zip(ours.tolist(), theirs.tolist()))
    assert len(pairs) == len(set(ours.tolist())) == len(set(theirs.tolist())), (
        "word partitions differ between DBoW2 semantics and the loaded tree"
    )
    # all 6 reachable words (5 depth-2 leaves + 1 early leaf) appear
    assert len(set(theirs.tolist())) == 6

    # weights ride along: for each (our word, dbow2 node) pair check idf
    node_w = {w: oracle.weight[n] for n, w in oracle.word_of_node.items()}
    for ow, tw in pairs:
        assert voc.word_idf[ow] == pytest.approx(node_w[tw])


def test_save_load_roundtrip_through_dbow2_format(tmp_path):
    rng = np.random.default_rng(5)
    corpus = _rand_descs(rng, 4000)
    voc = train_vocabulary(corpus, k=4, L=3, seed=0)
    path = str(tmp_path / "voc.txt")
    save_orbvoc_text(voc, path)

    # our own loader round-trips
    voc2 = load_orbvoc_text(path)
    qs = _rand_descs(rng, 800)
    np.testing.assert_array_equal(voc.transform_np(qs), voc2.transform_np(qs))

    # and the DBoW2-faithful oracle agrees on the partition
    oracle = DBoW2Reference(path)
    theirs = np.asarray([oracle.transform(q) for q in qs])
    ours = voc2.transform_np(qs)
    pairs = set(zip(ours.tolist(), theirs.tolist()))
    assert len(pairs) == len(set(ours.tolist())) == len(set(theirs.tolist()))

    # header passes the reference's validation gate
    # (TemplatedVocabulary.h:1372: 0<k<=20, 1<=L<=10, 0<=scoring<=5,
    # 0<=weighting<=3)
    header = open(path).readline().split()
    k, L, s, w = int(header[0]), int(header[1]), int(header[2]), int(header[3])
    assert 0 < k <= 20 and 1 <= L <= 10 and 0 <= s <= 5 and 0 <= w <= 3


def test_packaged_l5_vocabulary_loads_and_discriminates():
    """The shipped 10^5-word tree (k=10, L=5, trained on 4 procedural texture
    families + photometric augmentation — scripts/train_vocab_l5.py) must
    load and spread random descriptors over many words."""
    import importlib.resources as res

    import orb_slam2_2021_tpu.data as data

    if not (res.files(data) / "vocab_k10_L5.npz").is_file():
        pytest.skip("L5 vocabulary not trained yet (scripts/train_vocab_l5.py)")
    with res.as_file(res.files(data) / "vocab_k10_L5.npz") as p:
        voc = BinaryVocabulary.load(str(p))
    assert voc.k == 10 and voc.L == 5 and voc.n_words == 100_000
    rng = np.random.default_rng(0)
    words = voc.transform_np(_rand_descs(rng, 20000))
    assert len(np.unique(words)) > 5000
