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

PACKAGED_VOCAB = os.path.join(os.path.dirname(__file__), "..", "data", "vocab_k10_L4.npz")


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
        path = os.path.abspath(PACKAGED_VOCAB)
        if not os.path.exists(path):
            return None
        return PlaceRecognition(BinaryVocabulary.load(path))

    @staticmethod
    def from_file(path: str) -> "PlaceRecognition":
        """Suffix-dispatched like the reference (System.cc:84-98): `.txt`
        loads a DBoW2 text vocabulary (a real ORBvoc.txt drops in), anything
        else the native npz checkpoint."""
        if path.endswith(".txt"):
            from .vocab import load_orbvoc_text

            return PlaceRecognition(load_orbvoc_text(path))
        return PlaceRecognition(BinaryVocabulary.load(path))
