"""Table classifier (wired vs wireless).

Role parity with the reference q_cls/paddle_cls pair (reference:
rapid_doc/model/table/rapid_table_self/table_cls/main.py:18-177 —
PADDLE_Q_CLS consensus: wired only when both classifiers agree, else
wireless). A compact conv classifier in flax plays both roles; the
consensus hook remains so a second checkpoint can be slotted in.
"""
from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common.layers import ConvBNAct


class TableClsNet(nn.Module):
    num_classes: int = 2  # 0: wired, 1: wireless

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate((16, 32, 64, 128)):
            x = ConvBNAct(f, 3, strides=2, act="hardswish", name=f"conv{i}")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(64, name="fc1")(x)
        x = jax.nn.hard_swish(x)
        return nn.Dense(self.num_classes, name="fc2")(x)


class TableClassifier:
    INPUT = 224

    def __init__(self, variables=None, seed: int = 0):
        self.model = TableClsNet()
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

    def __call__(self, imgs: list[np.ndarray]) -> list[str]:
        """Returns 'wired' | 'wireless' per table crop."""
        if not imgs:
            return []
        # uint8 transfer, power-of-two batch buckets (same discipline as
        # the orientation classifier)
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

        track("table_cls", self._fwd, (self.variables, batch),
              sig=(batch.shape, str(batch.dtype)))
        probs = np.asarray(self._fwd(self.variables, jnp.asarray(batch)))[:n]
        return ["wired" if p[0] >= p[1] else "wireless" for p in probs]


def heuristic_table_kind(img: np.ndarray) -> str:
    """Rule-based fallback when no trained classifier exists: count long
    horizontal+vertical ruling lines."""
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
    binary = cv2.adaptiveThreshold(
        gray, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY_INV, 15, 10
    )
    h, w = binary.shape
    horiz_k = cv2.getStructuringElement(cv2.MORPH_RECT, (max(w // 8, 8), 1))
    vert_k = cv2.getStructuringElement(cv2.MORPH_RECT, (1, max(h // 8, 8)))
    horiz = cv2.morphologyEx(binary, cv2.MORPH_OPEN, horiz_k)
    vert = cv2.morphologyEx(binary, cv2.MORPH_OPEN, vert_k)
    h_lines = (horiz.sum(axis=1) > 0.5 * 255 * w).sum()
    v_lines = (vert.sum(axis=0) > 0.5 * 255 * h).sum()
    return "wired" if h_lines >= 3 and v_lines >= 3 else "wireless"
