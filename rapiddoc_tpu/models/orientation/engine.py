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
        self.variables = variables
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
        probs = np.asarray(self._fwd(self.variables, jnp.asarray(batch)))[:n]
        return [ANGLES[int(p.argmax())] for p in probs]


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
