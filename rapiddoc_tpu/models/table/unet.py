"""UNet wired-table segmentation + host cell recovery.

Role parity with the reference wired-table pipeline (reference:
rapid_doc/model/table/rapid_table_self/table_structure/unet/main.py —
fixed 1024x1024 input, semantic line mask -> cell polygons ->
logical rows/cols; utils_table_recover.py). The network is a standard
UNet in flax; cell extraction runs on the host with OpenCV.
"""
from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common.layers import ConvBNAct


class DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = ConvBNAct(self.features, 3, name="conv1")(x)
        x = ConvBNAct(self.features, 3, name="conv2")(x)
        return x


class UNet(nn.Module):
    """Classic UNet; output 2-channel logits (line vs background)."""

    base: int = 16
    depth: int = 4
    out_channels: int = 2

    @nn.compact
    def __call__(self, x):
        skips = []
        f = self.base
        for i in range(self.depth):
            x = DoubleConv(f, name=f"down{i}")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            f *= 2
        x = DoubleConv(f, name="bottom")(x)
        for i in range(self.depth - 1, -1, -1):
            f //= 2
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = nn.Conv(f, (2, 2), padding="SAME", name=f"upconv{i}")(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = DoubleConv(f, name=f"up{i}")(x)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)


def extract_cells_from_mask(
    line_mask: np.ndarray, min_cell_area: int = 64
) -> list[list[float]]:
    """Line-probability mask -> cell boxes via connected components of the
    complement inside the table region."""
    mask = (line_mask > 0.5).astype(np.uint8)
    if mask.sum() < 10:
        return []
    # close gaps in the line lattice
    kernel = np.ones((3, 3), np.uint8)
    lattice = cv2.dilate(mask, kernel)
    inv = (1 - lattice).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(inv, connectivity=4)
    h, w = mask.shape
    cells = []
    for i in range(1, n):
        x, y, cw, ch, area = stats[i]
        if area < min_cell_area:
            continue
        # drop the outside background (touches the border massively)
        if x == 0 and y == 0 and cw == w and ch == h:
            continue
        touches_border = x == 0 or y == 0 or x + cw >= w or y + ch >= h
        if touches_border and area > 0.5 * h * w:
            continue
        cells.append([float(x), float(y), float(x + cw), float(y + ch)])
    cells.sort(key=lambda b: (b[1], b[0]))
    return cells


def cells_to_grid(cells: list[list[float]]) -> list[tuple[int, int, int, int]]:
    """Assign logical (row, col, rowspan, colspan) to cell boxes.

    Row/column boundaries are clustered with tolerances adaptive to the
    median cell size (reference role: rapid_table_self/table_structure/
    utils_table_recover.py logical row/col recovery); a cell's span is
    one plus the number of interior boundaries it crosses.
    """
    if not cells:
        return []
    widths = sorted(c[2] - c[0] for c in cells)
    heights = sorted(c[3] - c[1] for c in cells)
    med_w = widths[len(widths) // 2]
    med_h = heights[len(heights) // 2]
    tol_x = max(6.0, med_w * 0.3)
    tol_y = max(6.0, med_h * 0.3)

    def cluster(vals: list[float], tol: float) -> list[float]:
        out: list[list[float]] = []
        for v in sorted(vals):
            if not out or v - out[-1][-1] > tol:
                out.append([v])
            else:
                out[-1].append(v)
        return [sum(g) / len(g) for g in out]

    row_edges = cluster([c[1] for c in cells], tol_y)
    col_edges = cluster([c[0] for c in cells], tol_x)

    def nearest(edges: list[float], v: float) -> int:
        return min(range(len(edges)), key=lambda i: abs(edges[i] - v))

    grid = []
    for x0, y0, x1, y1 in cells:
        r = nearest(row_edges, y0)
        c = nearest(col_edges, x0)
        inner_rows = [e for e in row_edges if y0 + tol_y < e < y1 - tol_y * 0.5]
        inner_cols = [e for e in col_edges if x0 + tol_x < e < x1 - tol_x * 0.5]
        grid.append((r, c, 1 + len(inner_rows), 1 + len(inner_cols)))
    return grid


class WiredTableStructure:
    """Fixed-1024 UNet session + host recovery."""

    INPUT = 1024

    def __init__(self, variables=None, seed: int = 0):
        self.model = UNet()
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                np.zeros((1, 256, 256, 3), np.float32),
            )
        from ...engine.session import commit_params

        self.variables = commit_params(variables)
        # 4-bit luma wire (same trick as det/rec): ruling lines are
        # near-binary ink, so 16 gray levels detect them identically
        # while the 1024² upload drops 3 MB -> 0.5 MB per region.
        # RAPIDDOC_UNET_WIRE_BITS=8 restores uint8 RGB.
        import os

        self.nibble_wire = (
            os.environ.get("RAPIDDOC_UNET_WIRE_BITS", "4") == "4"
        )

        def fwd(v, x):
            # uint8 in (4x less host->device), /255 fused on device;
            # the host cell recovery only thresholds the line map at 0.5,
            # so ship a packed bitmask (32x less readback than f32 — d2h
            # is the slowest wire on a tunneled chip)
            if self.nibble_wire:
                # (B, H, W/2, 1) packed nibbles -> (B, H, W, 3)
                hi = (x >> 4).astype(jnp.float32)
                lo = (x & 15).astype(jnp.float32)
                luma = jnp.stack([hi, lo], axis=3).reshape(
                    x.shape[0], x.shape[1], x.shape[2] * 2
                ) / 15.0
                xin = jnp.broadcast_to(
                    luma[..., None], (*luma.shape, 3)
                ).astype(jnp.bfloat16)
            else:
                xin = (x.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
            logits = self.model.apply(v, xin).astype(jnp.float32)
            line = logits[..., 1] > logits[..., 0]  # softmax p1 > 0.5
            return jnp.packbits(line, axis=-1)

        self._fwd = jax.jit(fwd)

    def __call__(self, img: np.ndarray) -> tuple[list[list[float]], list]:
        """Returns (cell boxes in source pixels, logical grid)."""
        return self.batch([img])[0]

    def batch(
        self, imgs: list[np.ndarray]
    ) -> list[tuple[list[list[float]], list]]:
        """All tables dispatched before any mask is fetched."""
        from ...engine.flops import track

        from ...engine.buckets import batch_chunks, pad_rows

        prepped = []
        for img in imgs:
            resized = cv2.resize(img, (self.INPUT, self.INPUT))
            if self.nibble_wire:
                from ..ocr.pre_post import pack_nibbles, to_luma

                resized = pack_nibbles(to_luma(resized))[..., 0]
            prepped.append(resized)
        # batch regions into (1,2,4)-bucketed calls: all crops share the
        # fixed 1024^2 shape, so one program serves every batch bucket
        # and per-call dispatch overhead amortizes 4x
        handles = []
        rows_meta: list[tuple[int, int]] = []  # (handle idx, row in batch)
        for s, e, padded in batch_chunks(len(prepped), sizes=(1, 2, 4)):
            batch = pad_rows(np.stack(prepped[s:e]), padded)
            track(
                "table_unet", self._fwd, (self.variables, batch),
                sig=(batch.shape, str(batch.dtype)),
            )
            h = self._fwd(self.variables, jnp.asarray(batch))
            for j in range(e - s):
                rows_meta.append((len(handles), j))
            handles.append(h)
        fetched: list[np.ndarray | None] = [None] * len(handles)
        out = []
        for img, (hi, row) in zip(imgs, rows_meta):
            if fetched[hi] is None:
                fetched[hi] = np.asarray(handles[hi])
            bits = fetched[hi][row]
            mask = np.unpackbits(bits, axis=-1)[:, : self.INPUT]
            cells = extract_cells_from_mask(mask.astype(np.float32))
            h, w = img.shape[:2]
            sx, sy = w / self.INPUT, h / self.INPUT
            scaled = [
                [c[0] * sx, c[1] * sy, c[2] * sx, c[3] * sy] for c in cells
            ]
            out.append((scaled, cells_to_grid(cells)))
        return out
