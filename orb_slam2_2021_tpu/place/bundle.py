"""PlaceRecognition bundle: vocabulary + device tree + keyframe database.

The single handle the pipeline passes around (System ctor loads the
vocabulary like the reference loads ORBvoc, System.cc:84-98).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .kf_database import KeyFrameDatabase
from .vocab import BinaryVocabulary, make_transform_fn

# default: the 10^5-word tree (k=10, L=5) trained on 4 procedural texture
# families + photometric augmentation (scripts/train_vocab_l5.py); the
# smaller L4 tree remains packaged for fast CPU tests via VOCAB_SMALL
_DATA = os.path.join(os.path.dirname(__file__), "..", "data")
PACKAGED_VOCAB_L6 = os.path.join(_DATA, "vocab_k10_L6.npz")  # 10^6 words,
#   the reference's shipped scale (KeyFrame.cc:64-66); scripts/train_vocab_l6.py
PACKAGED_VOCAB = os.path.join(_DATA, "vocab_k10_L5.npz")
PACKAGED_VOCAB_SMALL = os.path.join(_DATA, "vocab_k10_L4.npz")


class PlaceRecognition:
    def __init__(self, voc: BinaryVocabulary):
        self.voc = voc
        self.kfdb = KeyFrameDatabase(voc)
        self._tree = jnp.asarray(voc.node_desc)
        self._fn = make_transform_fn(voc.k, voc.L)

    def transform(self, desc, valid):
        """[N, 8] descriptors -> [N] word ids (device)."""
        return self._fn(self._tree, desc, valid)

    @staticmethod
    def load_default() -> Optional["PlaceRecognition"]:
        for path in (PACKAGED_VOCAB_L6, PACKAGED_VOCAB, PACKAGED_VOCAB_SMALL):
            path = os.path.abspath(path)
            if os.path.exists(path):
                return PlaceRecognition(BinaryVocabulary.load(path))
        return None

    @staticmethod
    def from_file(path: str) -> "PlaceRecognition":
        """Suffix-dispatched like the reference (System.cc:84-98): `.txt`
        loads a DBoW2 text vocabulary (a real ORBvoc.txt drops in), anything
        else the native npz checkpoint."""
        if path.endswith(".txt"):
            from .vocab import load_orbvoc_text

            return PlaceRecognition(load_orbvoc_text(path))
        return PlaceRecognition(BinaryVocabulary.load(path))
