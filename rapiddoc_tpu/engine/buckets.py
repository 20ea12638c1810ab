"""Shape-bucket registry — the anti-recompile strategy.

XLA compiles one program per input shape. OCR crops and page renders have
arbitrary sizes, so every model runs on a small closed set of padded shapes
(generalizing the reference's 64-px resolution grouping,
reference: rapid_doc/backend/pipeline/analyze_utils.py:157-190, to a
device-friendly pad+mask discipline).
"""
from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from typing import Sequence


def _ceil_to(value: int, step: int, lo: int, hi: int) -> int:
    v = max(lo, min(hi, value))
    return min(hi, int(math.ceil(v / step)) * step)


@dataclass(frozen=True)
class BucketSpec:
    """Defines the closed shape set for one model's inputs."""

    # spatial buckets: explicit sorted edge lists, or stride-generated
    heights: tuple[int, ...] = ()
    widths: tuple[int, ...] = ()
    stride: int = 128
    min_side: int = 128
    max_side: int = 1024
    batch_sizes: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)

    def bucket_dim(self, value: int, edges: tuple[int, ...]) -> int:
        if edges:
            idx = bisect.bisect_left(edges, min(value, edges[-1]))
            return edges[min(idx, len(edges) - 1)]
        return _ceil_to(value, self.stride, self.min_side, self.max_side)

    def bucket_hw(self, h: int, w: int) -> tuple[int, int]:
        return (self.bucket_dim(h, self.heights), self.bucket_dim(w, self.widths))

    def bucket_batch(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def max_batch(self) -> int:
        return self.batch_sizes[-1]


# det max batch 4: full pages are large transfers (~1-3 MB each), and
# smaller chunks pipeline host->device copies under compute instead of
# serializing one big copy before any math (measured ~25% faster on a
# 12-page window over the tunneled link)
DET_BUCKETS = BucketSpec(stride=160, min_side=320, max_side=1280,
                         batch_sizes=(1, 2, 4))
# few, large buckets: padding FLOPs are nearly free on the MXU while
# every distinct (width x batch) pair is one more compiled program the
# tunneled device must keep resident — observed ~0.5-0.9s per-program
# (re)activation stalls when a pipeline run cycles through many programs
REC_BUCKETS = BucketSpec(
    heights=(48,),
    widths=(160, 320, 640),
    batch_sizes=(32, 128),
)
FIXED_800 = BucketSpec(heights=(800,), widths=(800,), batch_sizes=(1, 2, 4, 8))
FIXED_640 = BucketSpec(heights=(640,), widths=(640,), batch_sizes=(1, 2, 4, 8))
FIXED_480 = BucketSpec(heights=(480,), widths=(480,), batch_sizes=(1, 2, 4, 8, 16))
FIXED_1024 = BucketSpec(heights=(1024,), widths=(1024,), batch_sizes=(1, 2, 4))


def pad_rows(batch, target: int):
    """Pad axis 0 to `target` rows by repeating the last row (real pixels
    keep the padded rows on the fast numeric path; results are sliced off)."""
    import numpy as np

    n = batch.shape[0]
    if n == target:
        return batch
    return np.concatenate(
        [batch, np.repeat(batch[-1:], target - n, axis=0)], axis=0
    )


def batch_chunks(
    n: int, sizes: tuple[int, ...] = (1, 2, 4, 8, 16)
) -> list[tuple[int, int, int]]:
    """Split n rows into (start, stop, padded_size) chunks whose padded
    sizes all come from the closed `sizes` set — jit then traces at most
    len(sizes) batch shapes no matter how many tables/formulas a document
    has (the same discipline JaxSession applies via BucketSpec.bucket_batch)."""
    out: list[tuple[int, int, int]] = []
    start = 0
    mx = sizes[-1]
    while start < n:
        take = min(mx, n - start)
        padded = next(b for b in sizes if take <= b)
        out.append((start, start + take, padded))
        start += take
    return out


def group_by_bucket(
    shapes: Sequence[tuple[int, int]], spec: BucketSpec
) -> dict[tuple[int, int], list[int]]:
    """Group item indices by their (H, W) bucket."""
    groups: dict[tuple[int, int], list[int]] = {}
    for i, (h, w) in enumerate(shapes):
        groups.setdefault(spec.bucket_hw(h, w), []).append(i)
    return groups
