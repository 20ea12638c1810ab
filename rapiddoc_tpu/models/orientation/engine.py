"""Page/text orientation classifier (0/90/180/270).

Role parity with the reference (reference:
rapid_doc/model/orientation/rapid_orientation_model.py:6-53 — tiny
classifier gated by portrait-aspect + vertical-text heuristics).
"""
from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common.layers import ConvBNAct

ANGLES = (0, 90, 180, 270)


class OrientationNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i, f in enumerate((16, 32, 64, 128)):
            x = ConvBNAct(f, 3, strides=2, act="hardswish", name=f"conv{i}")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(4, name="fc")(x)


class OrientationClassifier:
    INPUT = 224

    def __init__(self, variables=None, seed: int = 0):
        self.model = OrientationNet()
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                np.zeros((1, self.INPUT, self.INPUT, 3), np.float32),
            )
        from ...engine.session import commit_params

        self.variables = commit_params(variables)
        self._fwd = jax.jit(
            lambda v, x: jax.nn.softmax(
                self.model.apply(
                    v,
                    (x.astype(jnp.float32) / 255.0).astype(jnp.bfloat16),
                ).astype(jnp.float32),
                axis=-1,
            )
        )

    def __call__(self, imgs: list[np.ndarray]) -> list[int]:
        if not imgs:
            return []
        # uint8 transfer, batch padded to a power of two so recompiles
        # stay O(log max-batch), not O(distinct counts)
        batch = np.stack(
            [cv2.resize(im, (self.INPUT, self.INPUT)) for im in imgs]
        )
        n = len(imgs)
        nb = 1
        while nb < n:
            nb *= 2
        if nb != n:
            batch = np.concatenate(
                [batch, np.zeros((nb - n, *batch.shape[1:]), batch.dtype)]
            )
        from ...engine.flops import track

        track("orientation", self._fwd, (self.variables, batch),
              sig=(batch.shape, str(batch.dtype)))
        probs = np.asarray(self._fwd(self.variables, jnp.asarray(batch)))[:n]
        return [ANGLES[int(p.argmax())] for p in probs]


class OnnxOrientationClassifier:
    """Published rapid_orientation.onnx via the JAX ONNX interpreter
    (reference: rapid_orientation/main — resize_short 256, center crop
    224, ImageNet norm; label order from the model's metadata)."""

    def __init__(self, path):
        from ...engine.onnx_jax import OnnxJaxFunction
        from ...tools.onnx_reader import read_onnx_metadata

        self.fn = OnnxJaxFunction.from_file(path)
        meta = read_onnx_metadata(path)
        labels = (meta.get("character") or "").splitlines()
        self.angles = [
            int(x) for x in labels if x.strip().isdigit()
        ] or list(ANGLES)

    @staticmethod
    def _pre(img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        p = 256.0 / min(h, w)
        img = cv2.resize(img, (int(round(w * p)), int(round(h * p))))
        h, w = img.shape[:2]
        y0, x0 = (h - 224) // 2, (w - 224) // 2
        x = img[y0 : y0 + 224, x0 : x0 + 224].astype(np.float32) / 255.0
        x = (x - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
            [0.229, 0.224, 0.225], np.float32
        )
        return x.transpose(2, 0, 1)

    def __call__(self, imgs: list[np.ndarray]) -> list[int]:
        if not imgs:
            return []
        x = np.stack([self._pre(im) for im in imgs]).astype(np.float32)
        out = np.asarray(self.fn(x)[0])
        return [self.angles[int(r.argmax())] for r in out]


def build_orientation_classifier(models_dir, variables=None):
    """Published .onnx preferred; flax net (trained/random) otherwise."""
    onnx_path = models_dir / "rapid_orientation.onnx"
    if variables is None and onnx_path.is_file():
        return OnnxOrientationClassifier(onnx_path)
    return OrientationClassifier(variables)


def should_check_orientation(img: np.ndarray) -> bool:
    """Gate: only landscape-ish pages or pages with vertical text runs are
    worth classifying (reference heuristic)."""
    h, w = img.shape[:2]
    return w > h * 1.2


def rotate_image(img: np.ndarray, angle: int) -> np.ndarray:
    if angle % 360 == 0:
        return img
    k = (angle // 90) % 4
    return np.ascontiguousarray(np.rot90(img, k))
