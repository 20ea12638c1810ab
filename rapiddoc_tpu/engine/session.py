"""JaxSession: the inference-engine layer.

Replaces the role onnxruntime/OpenVINO play in the reference
(reference: rapid_doc/model/layout/rapid_layout_self/inference_engine/
onnxruntime/main.py InferSession): a model forward compiled once per
(H, W, batch) bucket, with pad+mask semantics, bf16 compute, and
data-parallel sharding over the device mesh.
"""
from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import data_sharding, get_mesh, replicated
from ..utils.logging import get_logger
from .buckets import BucketSpec

logger = get_logger("rapiddoc_tpu.engine")


def _enable_persistent_compile_cache() -> None:
    """Persist compiled XLA programs across processes — the bucket set
    is closed, so a warm cache turns process start into cache hits.
    DEFAULT ON since round 5: the rehearsal (COLDSTART.json) measured
    first-parse 51s -> 26s with a warm cache on this backend (earlier
    rounds saw no benefit; the backend now honors it). Default dir is
    ~/.cache/rapiddoc_tpu/xla_cache; override with
    RAPIDDOC_XLA_CACHE_DIR=<dir> or disable with =off."""
    import os

    target = os.environ.get("RAPIDDOC_XLA_CACHE_DIR")
    # "" kept as a disable spelling: it disabled the cache before the
    # default flipped on, and operators may still export an empty var
    if target in ("", "0", "off", "none"):
        return
    if not target:
        target = os.path.join(
            os.path.expanduser("~"), ".cache", "rapiddoc_tpu", "xla_cache"
        )
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:  # older jax or read-only fs: cache is best-effort
        logger.debug("persistent compile cache unavailable", exc_info=True)


_enable_persistent_compile_cache()


@dataclass
class SessionStats:
    compiles: int = 0
    calls: int = 0
    items: int = 0
    padded_items: int = 0
    bytes_in: int = 0
    bytes_out: int = 0
    fetches: int = 0

    def as_dict(self) -> dict:
        return {
            "compiles": self.compiles,
            "calls": self.calls,
            "items": self.items,
            "padded_items": self.padded_items,
            "pad_overhead": (self.padded_items / self.items - 1.0)
            if self.items
            else 0.0,
            "bytes_in": self.bytes_in,
            "bytes_out": self.bytes_out,
            "fetches": self.fetches,
        }


def commit_params(params: Any, *, dtype=None, sharding=None) -> Any:
    """Cast float weight leaves to the compute dtype and commit the tree
    to device once.

    Two distinct wins on TPU: (1) passing host numpy trees into a jitted
    call re-transfers every leaf per call — committing once makes weight
    transfer a startup cost, not a per-call one; (2) flax layers with
    dtype=None promote to the WIDEST of (input, param) dtype, so fp32
    params silently turn an intended-bf16 forward into fp32 — storing
    params in bf16 makes the compute genuinely bf16 (MXU-native) and
    halves weight HBM reads, which is what bounds AR decode steps.
    Integer / bool leaves pass through. dtype=None (the default) means
    "policy dtype": bf16 unless RAPIDDOC_FP32_PARAMS=1 flips the
    process-wide default to fp32. An EXPLICIT dtype always wins over the
    env var, so a single numerically sensitive model can keep fp32 (or
    bf16) without forcing it everywhere (docs/models.md)."""
    import os

    if dtype is None:
        dtype = (
            jnp.float32
            if os.environ.get("RAPIDDOC_FP32_PARAMS")
            else jnp.bfloat16
        )

    def cast(a):
        if isinstance(a, jax.Array):
            if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != dtype:
                return a.astype(dtype)
            return a
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating) and a.dtype != dtype:
            return a.astype(dtype)
        return a

    tree = jax.tree.map(cast, params)
    return jax.device_put(tree, sharding) if sharding is not None else jax.device_put(tree)


_ALL_SESSIONS: list["JaxSession"] = []


def session_stats_report() -> dict[str, dict]:
    """Transfer/compile accounting for every live JaxSession — the
    profiling view for tunnel-bound deployments where host<->device
    bytes and roundtrips, not FLOPs, set the ceiling."""
    return {s.name: s.stats.as_dict() for s in _ALL_SESSIONS}


_WIRE_BW: dict | None = None


def measure_wire_bandwidth(size_mb: int = 8, iters: int = 3) -> dict:
    """One-shot host<->device wire calibration (cached).

    Measures h2d / d2h bandwidth with a bulk uint8 buffer and the
    per-roundtrip latency with a tiny array — the two constants that,
    with the byte counters in SessionStats, let the stage report split
    wall time into est. transfer vs compute. On a tunneled chip the
    wire, not the MXU, usually sets the ceiling; this makes that
    auditable instead of asserted."""
    global _WIRE_BW
    if _WIRE_BW is not None:
        return _WIRE_BW
    n = size_mb * (1 << 20)
    buf = np.random.default_rng(0).integers(0, 255, n, dtype=np.uint8)
    dev = jax.device_put(buf)  # warm path + allocation
    jax.block_until_ready(dev)
    h2d = min(
        _timed(lambda: jax.block_until_ready(jax.device_put(buf)))
        for _ in range(iters)
    )
    # d2h: a FRESH device array per iteration — jax caches the host copy
    # of an array after its first transfer, so re-reading `dev` would
    # measure a memcpy, not the wire
    add_one = jax.jit(lambda a, i: a + i)
    d2h_times = []
    for i in range(iters):
        fresh = jax.block_until_ready(add_one(dev, np.uint8(i + 1)))
        d2h_times.append(_timed(lambda: np.asarray(fresh)))
    d2h = min(d2h_times)
    tiny0 = jax.device_put(np.zeros(8, np.uint8))
    rts = []
    for i in range(iters):
        t = jax.block_until_ready(add_one(tiny0, np.uint8(i + 1)))
        rts.append(_timed(lambda: np.asarray(t)))
    rt = min(rts)
    _WIRE_BW = {
        "h2d_mb_per_s": n / (1 << 20) / max(h2d, 1e-9),
        "d2h_mb_per_s": n / (1 << 20) / max(d2h, 1e-9),
        "roundtrip_ms": rt * 1e3,
    }
    return _WIRE_BW


def _timed(fn) -> float:
    import time

    tic = time.perf_counter()
    fn()
    return time.perf_counter() - tic


def transfer_split_report() -> dict[str, dict]:
    """Per-session estimated transfer cost from measured wire constants
    x observed byte counters: {session: {transfer_ms_est, bytes_in,
    bytes_out, fetches}}. transfer_ms_est is a SERIALIZED upper bound —
    dispatch/fetch pipelining overlaps transfer under compute, so stage
    wall can be below it; compute_ms = max(stage wall - est, 0) is the
    caller's join (bench.py)."""
    bw = measure_wire_bandwidth()
    out = {}
    for s in _ALL_SESSIONS:
        st = s.stats
        ms = (
            st.bytes_in / (1 << 20) / bw["h2d_mb_per_s"] * 1e3
            + st.bytes_out / (1 << 20) / bw["d2h_mb_per_s"] * 1e3
            + st.fetches * bw["roundtrip_ms"]
        )
        out[s.name] = {
            "transfer_ms_est": round(ms, 1),
            "bytes_in": st.bytes_in,
            "bytes_out": st.bytes_out,
            "fetches": st.fetches,
        }
    return out


class JaxSession:
    """Bucketed, jitted forward pass over NHWC image batches.

    `apply_fn(params, x)` must be shape-polymorphic at trace time and return
    an array or pytree of arrays whose leading dim is the batch dim.
    """

    def __init__(
        self,
        apply_fn: Callable[[Any, jax.Array], Any],
        params: Any,
        bucket_spec: BucketSpec,
        *,
        name: str = "model",
        compute_dtype: jnp.dtype | None = None,
        donate: bool = False,
        multi_device: bool = True,
        preproc: Callable[[jax.Array], jax.Array] | None = None,
        mesh=None,
    ):
        """`preproc`, when given, runs ON DEVICE inside the compiled
        program before the compute-dtype cast — callers then ship uint8
        batches (4x less host->device traffic, the usual bottleneck on a
        tunneled chip) and normalization fuses into the model's first
        convolution's XLA program."""
        self.name = name
        self.apply_fn = apply_fn
        self.bucket_spec = bucket_spec
        if compute_dtype is None:
            # policy dtype: bf16 unless RAPIDDOC_FP32_PARAMS flips the
            # process default; an explicit compute_dtype always wins
            import os

            compute_dtype = (
                jnp.float32
                if os.environ.get("RAPIDDOC_FP32_PARAMS")
                else jnp.bfloat16
            )
        self.compute_dtype = compute_dtype
        self.preproc = preproc
        self.stats = SessionStats()
        self._compiled: dict[tuple[int, int, int, int], Callable] = {}
        self._lock = threading.Lock()
        self.mesh = mesh if mesh is not None else (
            get_mesh() if multi_device else None
        )
        self.n_shards = (
            self.mesh.devices.size if self.mesh is not None else 1
        )
        self.params = commit_params(
            params,
            dtype=compute_dtype,
            sharding=replicated(self.mesh)
            if self.mesh is not None and self.n_shards > 1
            else None,
        )
        _ALL_SESSIONS.append(self)

    # ----------------------------------------------------------------- jit

    def _get_compiled(
        self, batch: int, h: int, w: int, c: int, dtype
    ) -> Callable:
        key = (batch, h, w, c, str(dtype))
        fn = self._compiled.get(key)
        if fn is not None:
            return fn
        with self._lock:
            fn = self._compiled.get(key)
            if fn is not None:
                return fn

            def forward(params, x):
                if self.preproc is not None:
                    x = self.preproc(x)
                x = x.astype(self.compute_dtype)
                out = self.apply_fn(params, x)
                return jax.tree.map(
                    lambda a: a.astype(jnp.float32)
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a,
                    out,
                )

            if self.mesh is not None and self.n_shards > 1 and batch % self.n_shards == 0:
                in_shardings = (replicated(self.mesh), data_sharding(self.mesh))
                fn = jax.jit(forward, in_shardings=in_shardings)
            else:
                if self.mesh is not None and self.n_shards > 1:
                    # a mis-bucketed batch quietly serializing onto one
                    # device is an n_shards-x slowdown — never silent
                    logger.warning(
                        "%s: batch=%d not divisible by %d shards — "
                        "FALLING BACK to single-device execution for "
                        "this bucket (check BucketSpec batch sizes)",
                        self.name, batch, self.n_shards,
                    )
                fn = jax.jit(forward)
            self.stats.compiles += 1
            logger.info(
                "%s: compiling bucket batch=%d %dx%dx%d (compile #%d)",
                self.name, batch, h, w, c, self.stats.compiles,
            )
            # AOT-compile the bucket (shapes are static by construction):
            # the compile was happening at first call anyway, and the
            # COMPILED executable's cost_analysis works on every backend
            # (Lowered.cost_analysis returns None through axon tunnels),
            # which is what feeds the bench's MFU accounting
            try:
                aparams = jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                    self.params,
                )
                ax = jax.ShapeDtypeStruct((batch, h, w, c), dtype)
                compiled = fn.lower(aparams, ax).compile()
                from .flops import register_compiled

                register_compiled(self.name, key, compiled)
                fn = compiled
            except Exception:
                # tracing-based jit still works; only the accounting is
                # degraded
                logger.debug(
                    "%s: AOT compile unavailable, using traced jit",
                    self.name, exc_info=True,
                )
            self._compiled[key] = fn
            return fn

    # ---------------------------------------------------------------- call

    def dispatch(self, batch_nhwc: np.ndarray) -> tuple[Any, int]:
        """Enqueue the forward pass; returns (device_output, n) WITHOUT
        synchronizing. Transfers and computes of successive dispatches
        pipeline on the device stream — the per-call host<->device
        roundtrip (tens of ms on a tunneled chip) is paid once at fetch,
        not once per batch.

        Batches larger than the biggest bucket are split into
        bucket-sized chunks whose outputs are concatenated on device —
        callers never have to know the bucket ceiling."""
        n, h, w, c = batch_nhwc.shape
        max_b = self.bucket_spec.max_batch()
        if n > max_b:
            handles = [
                self.dispatch(batch_nhwc[i : i + max_b])
                for i in range(0, n, max_b)
            ]
            return self._merge_handles(handles)
        nb = self.bucket_spec.bucket_batch(n)
        if self.mesh is not None and self.n_shards > 1:
            # keep batch divisible by shard count for even data-parallel split
            nb = max(nb, self.n_shards)
            if nb % self.n_shards:
                nb = ((nb + self.n_shards - 1) // self.n_shards) * self.n_shards
        # retain the PRE-padding host input as the retry source so a
        # re-dispatch recomputes the same true n (a padded source would
        # inflate n and return/merge zero-pad rows)
        retry_src = batch_nhwc
        if nb != n:
            pad = np.zeros((nb - n, h, w, c), dtype=batch_nhwc.dtype)
            batch_nhwc = np.concatenate([batch_nhwc, pad], axis=0)
        fn = self._get_compiled(nb, h, w, c, batch_nhwc.dtype)
        from .flops import count

        count(self.name, (nb, h, w, c, str(batch_nhwc.dtype)))
        out = fn(self.params, jnp.asarray(batch_nhwc))
        self.stats.calls += 1
        self.stats.items += n
        self.stats.padded_items += nb
        self.stats.bytes_in += batch_nhwc.nbytes
        # readback estimate: each output leaf sliced to the true n rows
        for leaf in jax.tree.leaves(out):
            rows = getattr(leaf, "shape", (nb,))
            frac = n / rows[0] if rows and rows[0] else 1.0
            self.stats.bytes_out += int(leaf.nbytes * frac)
        # NOTE: stats.fetches counts host materializations and is
        # incremented in fetch(), not here — _merge_handles collapses
        # many dispatch chunks into ONE roundtrip
        # the unpadded host input rides on the handle so fetch() can
        # re-dispatch after a transient tunnel/backend error
        return out, n, self, retry_src

    @staticmethod
    def _merge_handles(
        handles: Sequence[tuple]
    ) -> tuple:
        """Concatenate several dispatch() handles into one, slicing each
        chunk to its true n ON DEVICE — the host<->device roundtrip is
        paid once for the merged result, not per chunk. Falls back to
        the first handle's treedef; mismatched treedefs (shape-dependent
        outputs) are not merged on device."""
        if len(handles) == 1:
            return handles[0]
        trees = [h[0] for h in handles]
        ns = [h[1] for h in handles]
        treedef = jax.tree.structure(trees[0])
        assert all(
            jax.tree.structure(t) == treedef for t in trees[1:]
        ), "cannot merge dispatches with different output structures"
        leaves_per = [jax.tree.leaves(t) for t in trees]
        merged = [
            jnp.concatenate(
                [lv[k][:n] for lv, n in zip(leaves_per, ns)], axis=0
            )
            for k in range(len(leaves_per[0]))
        ]
        # retry source: the chunk handles themselves (each carries its
        # own host input), so a failed fetch can rebuild the merge
        return (
            jax.tree.unflatten(treedef, merged),
            sum(ns),
            handles[0][2],
            list(handles),
        )

    @staticmethod
    def _is_transient(exc: BaseException) -> bool:
        """Tunnel/backend errors worth a re-dispatch: the computation is
        pure, so re-running the batch is always safe."""
        if type(exc).__name__ not in (
            "JaxRuntimeError", "XlaRuntimeError", "RuntimeError"
        ):
            return False
        msg = str(exc).upper()
        return any(
            k in msg
            for k in ("INTERNAL", "UNAVAILABLE", "DEADLINE", "CANCELLED",
                      "ABORTED", "CONNECTION")
        )

    @staticmethod
    def _redispatch(handle: tuple):
        """Re-enqueue a handle's work from its retained host input(s);
        None when the handle carries no retry source."""
        _, _, sess, src = handle
        if src is None:
            return None
        if isinstance(src, list):
            chunks = []
            for ch in src:
                nh = JaxSession._redispatch(ch)
                if nh is None:
                    return None
                chunks.append(nh)
            return JaxSession._merge_handles(chunks)
        if sess is None:
            return None
        return sess.dispatch(src)

    @staticmethod
    def fetch(handle: tuple) -> Any:
        """Materialize a dispatch() result on the host (sliced to true n).

        This is where stats.fetches is counted: one increment per actual
        host materialization, so roundtrip accounting matches reality
        even when _merge_handles collapsed many dispatch chunks.

        A transient backend/tunnel failure (INTERNAL/UNAVAILABLE/...)
        re-dispatches the batch from the host input retained on the
        handle — the forward pass is pure, so a retry is always safe
        (RAPIDDOC_FETCH_RETRIES, default 2)."""
        import os
        import time

        out, n, sess, _src = handle
        if sess is not None:
            sess.stats.fetches += 1
        timing = bool(os.environ.get("RAPIDDOC_DEBUG_TIMING"))
        retries = int(os.environ.get("RAPIDDOC_FETCH_RETRIES", "2") or 0)
        while True:
            try:
                tic = time.perf_counter() if timing else 0.0
                res = jax.tree.map(lambda a: np.asarray(a[:n]), out)
                if timing:
                    logger.info(
                        "fetch n=%d took %.1f ms", n,
                        (time.perf_counter() - tic) * 1000.0,
                    )
                return res
            except Exception as exc:
                if retries <= 0 or not JaxSession._is_transient(exc):
                    raise
                retries -= 1
                logger.warning(
                    "%s: device fetch failed (%s: %.120s); re-dispatching "
                    "batch (%d retries left)",
                    getattr(sess, "name", "?"), type(exc).__name__, exc,
                    retries,
                )
                renewed = JaxSession._redispatch(handle)
                if renewed is None:
                    raise
                out, n = renewed[0], renewed[1]

    @classmethod
    def fetch_rows(
        cls, handles: Sequence[tuple[Any, int, "JaxSession"]]
    ) -> list[Any]:
        """Fetch several dispatch() handles and split them into per-row
        pytrees (callers dispatch all groups first, then fetch here)."""
        outs: list[Any] = []
        for handle in handles:
            fetched = cls.fetch(handle)
            leaves, treedef = jax.tree.flatten(fetched)
            for j in range(len(leaves[0])):
                outs.append(
                    jax.tree.unflatten(treedef, [lf[j] for lf in leaves])
                )
        return outs

    def __call__(self, batch_nhwc: np.ndarray) -> Any:
        """Run the forward pass on an already-bucketed NHWC batch.

        The batch is padded up to the bucket batch size; outputs are sliced
        back to the true batch length on the host.
        """
        return self.fetch(self.dispatch(batch_nhwc))

    def run_batched(
        self, images: Sequence[np.ndarray]
    ) -> list[Any]:
        """Run many same-bucket images, chunking by the max batch size.

        Two phases: enqueue every chunk first (device pipelines transfer
        i+1 under compute i), then fetch results."""
        if not images:
            return []
        max_b = self.bucket_spec.max_batch()
        handles = []
        for i in range(0, len(images), max_b):
            chunk = np.stack(images[i : i + max_b], axis=0)
            handles.append(self.dispatch(chunk))
        # single fetch: slice each chunk to its true n and concatenate on
        # device, so the host<->device roundtrip latency is paid once,
        # not once per chunk
        if len(handles) > 1:
            trees = [h[0] for h in handles]
            treedef = jax.tree.structure(trees[0])
            if all(jax.tree.structure(t) == treedef for t in trees[1:]):
                handles = [self._merge_handles(handles)]
        return self.fetch_rows(handles)


def pad_image_to(
    img: np.ndarray, target_h: int, target_w: int, pad_value: float = 0.0
) -> np.ndarray:
    """Bottom/right-pad an HWC image to the bucket shape."""
    h, w = img.shape[:2]
    if h == target_h and w == target_w:
        return img
    out = np.full(
        (target_h, target_w) + img.shape[2:], pad_value, dtype=img.dtype
    )
    out[:h, :w] = img[: target_h, : target_w]
    return out
