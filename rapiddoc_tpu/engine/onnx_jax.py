"""JAX interpreter for static-graph ONNX checkpoints.

Role: the reference runs every published model through onnxruntime/OpenVINO
(reference: rapid_doc/model/layout/rapid_layout_self/inference_engine/
onnxruntime/main.py:17-98). On TPU the equivalent is to *trace* the ONNX
graph into a jittable JAX function: weights stay device-resident arrays,
shape-manipulation chains (Shape->Slice->Concat->Reshape) are resolved
statically at trace time, and XLA fuses the rest. This runs any published
static-graph .onnx (layout RT-DETR family, UNET, table/orientation
classifiers, seal det, magika) without a hand-written per-model key map.

Control flow: If lowers to lax.cond (or resolves at trace time when the
condition is static); Loop lowers to lax.while_loop with a static max trip
count and preallocated scan buffers (see op_Loop). The in-house AR models
(formula, SLANet) still use dedicated flax implementations with KV-cached
lax.while_loop decodes — the TPU-correct structure — but published AR
ONNX exports now also run unmodified.

Dynamic batch/size dims in graph inputs are fixed per call-site shape
bucket (the pipeline's anti-recompile strategy), so every Shape op yields
concrete integers during tracing.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..tools.onnx_reader import OnnxModel, OnnxNode, read_onnx_model

_FLOAT = {1: jnp.float32, 10: jnp.float16, 11: jnp.float64}
_ONNX_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _is_static(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, bool))


def _np(x) -> np.ndarray:
    return np.asarray(x)


class _Executor:
    """Traces an OnnxModel node list into jnp ops.

    Values in the environment are either numpy arrays (statically known —
    initializers and everything derived only from them and from shapes) or
    JAX tracers. Ops whose inputs are all static run eagerly in numpy so
    downstream Reshape/Slice/Pad targets stay concrete.
    """

    def __init__(self, model: OnnxModel):
        self.model = model

    # -- helpers ----------------------------------------------------------

    def run(self, params: dict, inputs: dict):
        env: dict[str, Any] = {"": None}
        env.update(params)
        env.update(inputs)
        return self._exec(self.model, env)

    def _exec(self, graph, env: dict):
        """Execute a node list against an environment (shared by the top
        graph and If/Loop subgraphs; subgraph envs overlay the outer scope
        per ONNX name-capture semantics)."""
        for node in graph.nodes:
            handler = getattr(self, f"op_{node.op_type}", None)
            if handler is None:
                raise NotImplementedError(
                    f"ONNX op {node.op_type!r} not supported "
                    f"(node {node.name!r})"
                )
            self._env = env  # current scope, for subgraph-bearing ops
            vals = handler(node, [env[i] for i in node.inputs])
            if not isinstance(vals, (tuple, list)):
                vals = (vals,)
            for out_name, val in zip(node.outputs, vals):
                if out_name:
                    env[out_name] = val
        return [env[o] for o in graph.output_names]

    def _run_subgraph(self, graph, ins, outer_env: dict):
        env = dict(outer_env)  # outer-scope capture
        env[""] = None
        for k, v in graph.initializers.items():
            env[k] = np.asarray(v)
        for name, v in zip(graph.input_names, ins):
            env[name] = v
        return self._exec(graph, env)

    @staticmethod
    def _static_all(xs) -> bool:
        return all(_is_static(x) for x in xs if x is not None)

    @staticmethod
    def _ew(fn_np, fn_jnp, xs):
        """Elementwise/unary-binary dispatch: numpy when fully static."""
        if all(_is_static(x) for x in xs):
            return fn_np(*[_np(x) for x in xs])
        return fn_jnp(*[jnp.asarray(x) if _is_static(x) else x for x in xs])

    # -- tensor plumbing ---------------------------------------------------

    def op_Constant(self, node, xs):
        v = node.attrs.get("value")
        if v is None:
            if "value_float" in node.attrs:
                return np.float32(node.attrs["value_float"])
            if "value_int" in node.attrs:
                return np.int64(node.attrs["value_int"])
            if "value_ints" in node.attrs:
                return np.asarray(node.attrs["value_ints"], np.int64)
            if "value_floats" in node.attrs:
                return np.asarray(node.attrs["value_floats"], np.float32)
            raise NotImplementedError("Constant without tensor value")
        return v

    def op_Identity(self, node, xs):
        return xs[0]

    def op_Cast(self, node, xs):
        dt = _ONNX_DTYPES[node.attrs["to"]]
        x = xs[0]
        if _is_static(x):
            return _np(x).astype(dt)
        return x.astype(dt)

    def op_Shape(self, node, xs):
        x = xs[0]
        shape = np.asarray(
            _np(x).shape if _is_static(x) else x.shape, np.int64
        )
        start = node.attrs.get("start", 0)
        end = node.attrs.get("end", len(shape))
        return shape[start:end]

    def op_Reshape(self, node, xs):
        x, shape = xs
        shape = [int(s) for s in _np(shape)]
        cur = list(_np(x).shape if _is_static(x) else x.shape)
        shape = [
            cur[i] if s == 0 and node.attrs.get("allowzero", 0) == 0 else s
            for i, s in enumerate(shape)
        ]
        if _is_static(x):
            return _np(x).reshape(shape)
        return x.reshape(shape)

    def op_Transpose(self, node, xs):
        perm = node.attrs.get("perm")
        x = xs[0]
        if _is_static(x):
            return np.transpose(_np(x), perm)
        return jnp.transpose(x, perm)

    def op_Concat(self, node, xs):
        axis = node.attrs["axis"]
        if self._static_all(xs):
            return np.concatenate([_np(x) for x in xs], axis=axis)
        return jnp.concatenate([jnp.asarray(x) for x in xs], axis=axis)

    def op_Split(self, node, xs):
        x = xs[0]
        axis = node.attrs.get("axis", 0)
        xs_shape = _np(x).shape if _is_static(x) else x.shape
        if len(xs) > 1 and xs[1] is not None:
            sizes = [int(s) for s in _np(xs[1])]
        elif "split" in node.attrs:
            sizes = list(node.attrs["split"])
        else:
            n = len(node.outputs)
            sizes = [xs_shape[axis] // n] * n
        idx = np.cumsum(sizes)[:-1].tolist()
        if _is_static(x):
            return tuple(np.split(_np(x), idx, axis=axis))
        return tuple(jnp.split(x, idx, axis=axis))

    def op_Slice(self, node, xs):
        x = xs[0]
        shape = list(_np(x).shape if _is_static(x) else x.shape)
        rank = len(shape)
        if len(xs) > 1:  # opset >= 10: starts/ends/axes/steps inputs
            starts = [int(v) for v in _np(xs[1])]
            ends = [int(v) for v in _np(xs[2])]
            axes = (
                [int(v) for v in _np(xs[3])]
                if len(xs) > 3 and xs[3] is not None
                else list(range(len(starts)))
            )
            steps = (
                [int(v) for v in _np(xs[4])]
                if len(xs) > 4 and xs[4] is not None
                else [1] * len(starts)
            )
        else:
            starts = list(node.attrs["starts"])
            ends = list(node.attrs["ends"])
            axes = list(node.attrs.get("axes", range(len(starts))))
            steps = [1] * len(starts)
        slices = [slice(None)] * rank
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            ax = ax % rank
            slices[ax] = slice(st, en, sp)
        return (_np(x) if _is_static(x) else x)[tuple(slices)]

    def op_Squeeze(self, node, xs):
        x = xs[0]
        axes = (
            [int(v) for v in _np(xs[1])]
            if len(xs) > 1 and xs[1] is not None
            else node.attrs.get("axes")
        )
        if _is_static(x):
            return np.squeeze(_np(x), tuple(axes) if axes else None)
        return jnp.squeeze(x, tuple(axes) if axes else None)

    def op_Unsqueeze(self, node, xs):
        x = xs[0]
        axes = (
            [int(v) for v in _np(xs[1])]
            if len(xs) > 1 and xs[1] is not None
            else list(node.attrs["axes"])
        )
        for ax in sorted(axes):
            x = (
                np.expand_dims(_np(x), ax)
                if _is_static(x)
                else jnp.expand_dims(x, ax)
            )
        return x

    def op_Flatten(self, node, xs):
        x = xs[0]
        axis = node.attrs.get("axis", 1)
        shape = _np(x).shape if _is_static(x) else x.shape
        lead = int(np.prod(shape[:axis])) if axis else 1
        if _is_static(x):
            return _np(x).reshape(lead, -1)
        return x.reshape(lead, -1)

    def op_Expand(self, node, xs):
        x, shape = xs
        target = [int(s) for s in _np(shape)]
        xshape = list(_np(x).shape if _is_static(x) else x.shape)
        # onnx Expand is bidirectional broadcast
        while len(xshape) < len(target):
            xshape.insert(0, 1)
        out = [max(a, b) for a, b in zip(xshape, target)]
        if _is_static(x):
            return np.broadcast_to(_np(x).reshape(xshape), out)
        return jnp.broadcast_to(x.reshape(xshape), out)

    def op_Tile(self, node, xs):
        x, reps = xs
        reps = [int(r) for r in _np(reps)]
        if _is_static(x):
            return np.tile(_np(x), reps)
        return jnp.tile(x, reps)

    def op_Range(self, node, xs):
        start, limit, delta = (int(_np(v)) for v in xs)
        return np.arange(start, limit, delta, np.int64)

    def op_Gather(self, node, xs):
        x, idx = xs
        axis = node.attrs.get("axis", 0)
        if _is_static(x) and _is_static(idx):
            return np.take(_np(x), _np(idx).astype(np.int64), axis=axis)
        return jnp.take(
            jnp.asarray(x), jnp.asarray(idx).astype(jnp.int32), axis=axis
        )

    def op_GatherElements(self, node, xs):
        x, idx = xs
        axis = node.attrs.get("axis", 0)
        return jnp.take_along_axis(
            jnp.asarray(x), jnp.asarray(idx).astype(jnp.int32), axis=axis
        )

    def op_GatherND(self, node, xs):
        x, idx = xs
        if node.attrs.get("batch_dims", 0) != 0:
            raise NotImplementedError("GatherND batch_dims != 0")
        x = jnp.asarray(x)
        idx = _np(idx) if _is_static(idx) else idx
        if _is_static(idx):
            comps = tuple(idx[..., i] for i in range(idx.shape[-1]))
            return x[comps]
        idx = jnp.asarray(idx).astype(jnp.int32)
        comps = tuple(idx[..., i] for i in range(idx.shape[-1]))
        return x[comps]

    def op_ConstantOfShape(self, node, xs):
        shape = [int(s) for s in _np(xs[0])]
        value = node.attrs.get("value")
        if value is None:
            return np.zeros(shape, np.float32)
        v = _np(value).ravel()[0]
        return np.full(shape, v, _np(value).dtype)

    def op_OneHot(self, node, xs):
        idx, depth, values = xs
        axis = node.attrs.get("axis", -1)
        depth = int(_np(depth))
        off, on = (_np(values) if _is_static(values) else values)
        oh = jax.nn.one_hot(jnp.asarray(idx).astype(jnp.int32), depth,
                            axis=axis)
        return oh * (on - off) + off

    def op_Where(self, node, xs):
        if self._static_all(xs):
            return np.where(_np(xs[0]), _np(xs[1]), _np(xs[2]))
        return jnp.where(*[jnp.asarray(x) for x in xs])

    def op_Pad(self, node, xs):
        x = xs[0]
        mode = node.attrs.get("mode", "constant")
        if len(xs) > 1:
            pads = [int(p) for p in _np(xs[1])]
            cval = float(_np(xs[2])) if len(xs) > 2 and xs[2] is not None else 0.0
        else:
            pads = list(node.attrs["pads"])
            cval = node.attrs.get("value", 0.0)
        rank = len(pads) // 2
        widths = [(pads[i], pads[i + rank]) for i in range(rank)]
        jmode = {"constant": "constant", "reflect": "reflect",
                 "edge": "edge"}[mode]
        if jmode == "constant":
            return jnp.pad(jnp.asarray(x), widths, constant_values=cval)
        return jnp.pad(jnp.asarray(x), widths, mode=jmode)

    # -- math --------------------------------------------------------------

    def op_Add(self, node, xs):
        return self._ew(np.add, jnp.add, xs)

    def op_Sub(self, node, xs):
        return self._ew(np.subtract, jnp.subtract, xs)

    def op_Mul(self, node, xs):
        return self._ew(np.multiply, jnp.multiply, xs)

    def op_Div(self, node, xs):
        def np_div(a, b):
            if np.issubdtype(a.dtype, np.integer) and np.issubdtype(
                b.dtype, np.integer
            ):
                return a // b
            return a / b

        def jnp_div(a, b):
            if jnp.issubdtype(a.dtype, jnp.integer) and jnp.issubdtype(
                b.dtype, jnp.integer
            ):
                return a // b
            return a / b

        return self._ew(np_div, jnp_div, xs)

    def op_Mod(self, node, xs):
        return self._ew(np.mod, jnp.mod, xs)

    def op_Pow(self, node, xs):
        return self._ew(np.power, jnp.power, xs)

    def op_Sqrt(self, node, xs):
        return self._ew(np.sqrt, jnp.sqrt, xs)

    def op_Reciprocal(self, node, xs):
        return self._ew(lambda x: 1.0 / x, lambda x: 1.0 / x, xs)

    def op_Exp(self, node, xs):
        return self._ew(np.exp, jnp.exp, xs)

    def op_Log(self, node, xs):
        return self._ew(np.log, jnp.log, xs)

    def op_Erf(self, node, xs):
        return jax.scipy.special.erf(jnp.asarray(xs[0]))

    def op_Tanh(self, node, xs):
        return self._ew(np.tanh, jnp.tanh, xs)

    def op_Abs(self, node, xs):
        return self._ew(np.abs, jnp.abs, xs)

    def op_Neg(self, node, xs):
        return self._ew(np.negative, jnp.negative, xs)

    def op_Floor(self, node, xs):
        return self._ew(np.floor, jnp.floor, xs)

    def op_Ceil(self, node, xs):
        return self._ew(np.ceil, jnp.ceil, xs)

    def op_Round(self, node, xs):
        return self._ew(np.round, jnp.round, xs)

    def op_Sign(self, node, xs):
        return self._ew(np.sign, jnp.sign, xs)

    def op_Min(self, node, xs):
        out = xs[0]
        for x in xs[1:]:
            out = self._ew(np.minimum, jnp.minimum, [out, x])
        return out

    def op_Max(self, node, xs):
        out = xs[0]
        for x in xs[1:]:
            out = self._ew(np.maximum, jnp.maximum, [out, x])
        return out

    def op_Sum(self, node, xs):
        out = xs[0]
        for x in xs[1:]:
            out = self._ew(np.add, jnp.add, [out, x])
        return out

    def op_Clip(self, node, xs):
        x = jnp.asarray(xs[0])
        lo = (
            xs[1]
            if len(xs) > 1 and xs[1] is not None
            else node.attrs.get("min")
        )
        hi = (
            xs[2]
            if len(xs) > 2 and xs[2] is not None
            else node.attrs.get("max")
        )
        if lo is not None:
            x = jnp.maximum(x, jnp.asarray(lo, x.dtype))
        if hi is not None:
            x = jnp.minimum(x, jnp.asarray(hi, x.dtype))
        return x

    def op_Equal(self, node, xs):
        return self._ew(np.equal, jnp.equal, xs)

    def op_Greater(self, node, xs):
        return self._ew(np.greater, jnp.greater, xs)

    def op_GreaterOrEqual(self, node, xs):
        return self._ew(np.greater_equal, jnp.greater_equal, xs)

    def op_Less(self, node, xs):
        return self._ew(np.less, jnp.less, xs)

    def op_LessOrEqual(self, node, xs):
        return self._ew(np.less_equal, jnp.less_equal, xs)

    def op_Not(self, node, xs):
        return self._ew(np.logical_not, jnp.logical_not, xs)

    def op_And(self, node, xs):
        return self._ew(np.logical_and, jnp.logical_and, xs)

    def op_Or(self, node, xs):
        return self._ew(np.logical_or, jnp.logical_or, xs)

    # -- activations / normalization ----------------------------------------

    def op_Relu(self, node, xs):
        return jax.nn.relu(jnp.asarray(xs[0]))

    def op_LeakyRelu(self, node, xs):
        return jax.nn.leaky_relu(
            jnp.asarray(xs[0]), node.attrs.get("alpha", 0.01)
        )

    def op_PRelu(self, node, xs):
        x, slope = jnp.asarray(xs[0]), jnp.asarray(xs[1])
        if slope.ndim == 1 and x.ndim == 4:  # per-channel NCHW
            slope = slope.reshape(1, -1, 1, 1)
        return jnp.where(x >= 0, x, x * slope)

    def op_Sigmoid(self, node, xs):
        return jax.nn.sigmoid(jnp.asarray(xs[0]))

    def op_HardSigmoid(self, node, xs):
        alpha = node.attrs.get("alpha", 0.2)
        beta = node.attrs.get("beta", 0.5)
        return jnp.clip(alpha * jnp.asarray(xs[0]) + beta, 0.0, 1.0)

    def op_HardSwish(self, node, xs):
        x = jnp.asarray(xs[0])
        return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)

    def op_Softplus(self, node, xs):
        return jax.nn.softplus(jnp.asarray(xs[0]))

    def op_Gelu(self, node, xs):
        approx = node.attrs.get("approximate", "none") == "tanh"
        return jax.nn.gelu(jnp.asarray(xs[0]), approximate=approx)

    def op_Softmax(self, node, xs):
        axis = node.attrs.get("axis", -1)
        return jax.nn.softmax(jnp.asarray(xs[0]), axis=axis)

    def op_LogSoftmax(self, node, xs):
        axis = node.attrs.get("axis", -1)
        return jax.nn.log_softmax(jnp.asarray(xs[0]), axis=axis)

    def op_BatchNormalization(self, node, xs):
        x, scale, bias, mean, var = (jnp.asarray(v) for v in xs[:5])
        eps = node.attrs.get("epsilon", 1e-5)
        shape = [1, -1] + [1] * (x.ndim - 2)
        inv = jax.lax.rsqrt(var + eps)
        return (x - mean.reshape(shape)) * (inv * scale).reshape(
            shape
        ) + bias.reshape(shape)

    def op_LayerNormalization(self, node, xs):
        x = jnp.asarray(xs[0])
        scale = jnp.asarray(xs[1])
        bias = jnp.asarray(xs[2]) if len(xs) > 2 and xs[2] is not None else None
        axis = node.attrs.get("axis", -1)
        eps = node.attrs.get("epsilon", 1e-5)
        mean = jnp.mean(x, axis=axis, keepdims=True)
        var = jnp.var(x, axis=axis, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + eps) * scale
        return out + bias if bias is not None else out

    def op_InstanceNormalization(self, node, xs):
        x, scale, bias = (jnp.asarray(v) for v in xs)
        eps = node.attrs.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = [1, -1] + [1] * (x.ndim - 2)
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale.reshape(
            shape
        ) + bias.reshape(shape)

    # -- reductions ----------------------------------------------------------

    def _reduce(self, fn_np, fn_jnp, node, xs):
        x = xs[0]
        axes = (
            tuple(int(a) for a in _np(xs[1]))
            if len(xs) > 1 and xs[1] is not None
            else (
                tuple(node.attrs["axes"])
                if "axes" in node.attrs
                else None
            )
        )
        keep = bool(node.attrs.get("keepdims", 1))
        if _is_static(x):
            return fn_np(_np(x), axis=axes, keepdims=keep)
        return fn_jnp(x, axis=axes, keepdims=keep)

    def op_ReduceMean(self, node, xs):
        return self._reduce(np.mean, jnp.mean, node, xs)

    def op_ReduceSum(self, node, xs):
        return self._reduce(np.sum, jnp.sum, node, xs)

    def op_ReduceMax(self, node, xs):
        return self._reduce(np.max, jnp.max, node, xs)

    def op_ReduceMin(self, node, xs):
        return self._reduce(np.min, jnp.min, node, xs)

    def op_ReduceProd(self, node, xs):
        return self._reduce(np.prod, jnp.prod, node, xs)

    def op_ArgMax(self, node, xs):
        axis = node.attrs.get("axis", 0)
        keep = bool(node.attrs.get("keepdims", 1))
        out = jnp.argmax(jnp.asarray(xs[0]), axis=axis)
        return jnp.expand_dims(out, axis) if keep else out

    def op_TopK(self, node, xs):
        x = jnp.asarray(xs[0])
        k = int(_np(xs[1]))
        axis = node.attrs.get("axis", -1)
        largest = node.attrs.get("largest", 1)
        if axis not in (-1, x.ndim - 1):
            x = jnp.moveaxis(x, axis, -1)
        vals, idx = jax.lax.top_k(x if largest else -x, k)
        if not largest:
            vals = -vals
        if axis not in (-1, x.ndim - 1):
            vals = jnp.moveaxis(vals, -1, axis)
            idx = jnp.moveaxis(idx, -1, axis)
        return vals, idx.astype(jnp.int64)

    def op_CumSum(self, node, xs):
        axis = int(_np(xs[1]))
        return jnp.cumsum(jnp.asarray(xs[0]), axis=axis)

    # -- linear algebra -------------------------------------------------------

    def op_MatMul(self, node, xs):
        return jnp.matmul(jnp.asarray(xs[0]), jnp.asarray(xs[1]))

    def op_Gemm(self, node, xs):
        a, b = jnp.asarray(xs[0]), jnp.asarray(xs[1])
        if node.attrs.get("transA", 0):
            a = a.T
        if node.attrs.get("transB", 0):
            b = b.T
        out = node.attrs.get("alpha", 1.0) * (a @ b)
        if len(xs) > 2 and xs[2] is not None:
            out = out + node.attrs.get("beta", 1.0) * jnp.asarray(xs[2])
        return out

    def op_Einsum(self, node, xs):
        return jnp.einsum(node.attrs["equation"],
                          *[jnp.asarray(x) for x in xs])

    # -- convolution / pooling -------------------------------------------------

    @staticmethod
    def _conv_pads(node, x_shape, k_shape, strides, dilations):
        spatial = len(k_shape) - 2
        auto = node.attrs.get("auto_pad", "NOTSET")
        if auto in ("NOTSET", ""):
            pads = node.attrs.get("pads", [0] * 2 * spatial)
            return [
                (pads[i], pads[i + spatial]) for i in range(spatial)
            ]
        if auto == "VALID":
            return [(0, 0)] * spatial
        # SAME_UPPER / SAME_LOWER
        out = []
        for i in range(spatial):
            in_sz = x_shape[2 + i]
            k = (k_shape[2 + i] - 1) * dilations[i] + 1
            o = -(-in_sz // strides[i])
            total = max(0, (o - 1) * strides[i] + k - in_sz)
            lo = total // 2
            hi = total - lo
            out.append((lo, hi) if auto == "SAME_UPPER" else (hi, lo))
        return out

    def op_Conv(self, node, xs):
        x = jnp.asarray(xs[0])
        w = jnp.asarray(xs[1])
        spatial = w.ndim - 2
        strides = node.attrs.get("strides", [1] * spatial)
        dilations = node.attrs.get("dilations", [1] * spatial)
        groups = node.attrs.get("group", 1)
        pads = self._conv_pads(node, x.shape, w.shape, strides, dilations)
        dn = ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH")
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=pads,
            rhs_dilation=dilations, feature_group_count=groups,
            dimension_numbers=dn,
        )
        if len(xs) > 2 and xs[2] is not None:
            b = jnp.asarray(xs[2]).reshape((1, -1) + (1,) * spatial)
            out = out + b
        return out

    def op_ConvTranspose(self, node, xs):
        x = jnp.asarray(xs[0])
        w = jnp.asarray(xs[1])  # (Cin, Cout/groups, kH, kW)
        spatial = w.ndim - 2
        strides = node.attrs.get("strides", [1] * spatial)
        dilations = node.attrs.get("dilations", [1] * spatial)
        groups = node.attrs.get("group", 1)
        if groups != 1:
            raise NotImplementedError("grouped ConvTranspose")
        pads = node.attrs.get("pads", [0] * 2 * spatial)
        out_pads = node.attrs.get("output_padding", [0] * spatial)
        pad_pairs = [
            (
                dilations[i] * (w.shape[2 + i] - 1) - pads[i],
                dilations[i] * (w.shape[2 + i] - 1)
                - pads[i + spatial]
                + out_pads[i],
            )
            for i in range(spatial)
        ]
        w_flip = jnp.flip(w, axis=tuple(range(2, w.ndim)))
        w_t = jnp.swapaxes(w_flip, 0, 1)  # (Cout, Cin, kH, kW)
        dn = ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH")
        return jax.lax.conv_general_dilated(
            x, w_t, window_strides=[1] * spatial, padding=pad_pairs,
            lhs_dilation=strides, rhs_dilation=dilations,
            dimension_numbers=dn,
        ) + (
            jnp.asarray(xs[2]).reshape((1, -1) + (1,) * spatial)
            if len(xs) > 2 and xs[2] is not None
            else 0.0
        )

    def _pool(self, node, xs, reducer, init, is_avg=False):
        x = jnp.asarray(xs[0])
        k = list(node.attrs["kernel_shape"])
        spatial = len(k)
        strides = node.attrs.get("strides", [1] * spatial)
        dilations = node.attrs.get("dilations", [1] * spatial)
        pads = self._conv_pads(
            node, x.shape, [0, 0] + k, strides, dilations
        )
        ceil_mode = node.attrs.get("ceil_mode", 0)
        if ceil_mode:
            new_pads = []
            for i in range(spatial):
                in_sz = x.shape[2 + i] + pads[i][0] + pads[i][1]
                kk = (k[i] - 1) * dilations[i] + 1
                rem = (in_sz - kk) % strides[i]
                extra = (strides[i] - rem) % strides[i] if rem else 0
                new_pads.append((pads[i][0], pads[i][1] + extra))
            pads = new_pads
        window = (1, 1) + tuple(k)
        ws = (1, 1) + tuple(strides)
        wd = (1, 1) + tuple(dilations)
        pad_full = ((0, 0), (0, 0)) + tuple(pads)
        out = jax.lax.reduce_window(
            x, init, reducer, window, ws, pad_full, window_dilation=wd
        )
        if is_avg:
            if node.attrs.get("count_include_pad", 0) or not any(
                p != (0, 0) for p in pads
            ):
                out = out / np.prod(k)
            else:
                ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
                counts = jax.lax.reduce_window(
                    ones, 0.0, jax.lax.add, window, ws, pad_full,
                    window_dilation=wd,
                )
                out = out / counts
        return out

    def op_MaxPool(self, node, xs):
        return self._pool(node, xs, jax.lax.max, -jnp.inf)

    def op_AveragePool(self, node, xs):
        return self._pool(node, xs, jax.lax.add, 0.0, is_avg=True)

    def op_GlobalAveragePool(self, node, xs):
        x = jnp.asarray(xs[0])
        return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    def op_GlobalMaxPool(self, node, xs):
        x = jnp.asarray(xs[0])
        return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    # -- resize / sampling ------------------------------------------------------

    def op_Resize(self, node, xs):
        x = jnp.asarray(xs[0])
        mode = node.attrs.get("mode", "nearest")
        coord = node.attrs.get("coordinate_transformation_mode", "half_pixel")
        sizes = None
        if len(xs) > 3 and xs[3] is not None:
            sizes = [int(s) for s in _np(xs[3])]
        elif len(xs) > 2 and xs[2] is not None and _np(xs[2]).size:
            scales = [float(s) for s in _np(xs[2])]
            sizes = [
                int(round(d * s)) for d, s in zip(x.shape, scales)
            ]
        if sizes is None:
            raise NotImplementedError("Resize without sizes/scales")
        if mode == "nearest":
            # exact for integer upscale with asymmetric/floor (the Paddle
            # export default); jax.image nearest matches round-half-down
            method = "nearest"
        elif mode == "linear":
            method = "bilinear"
        elif mode == "cubic":
            method = "bicubic"
        else:
            raise NotImplementedError(f"Resize mode {mode}")
        if mode == "nearest" and coord in ("asymmetric",):
            b, c, h, w = x.shape
            oh, ow = sizes[2], sizes[3]
            rows = (np.arange(oh) * (h / oh)).astype(np.int32)
            cols = (np.arange(ow) * (w / ow)).astype(np.int32)
            return x[:, :, rows][:, :, :, cols]
        return jax.image.resize(x, sizes, method=method)

    def op_GridSample(self, node, xs):
        x = jnp.asarray(xs[0])  # (N, C, H, W)
        grid = jnp.asarray(xs[1])  # (N, Ho, Wo, 2) in [-1, 1]
        mode = node.attrs.get("mode", "bilinear")
        if mode not in ("bilinear", "linear"):
            raise NotImplementedError(f"GridSample mode {mode}")
        align = node.attrs.get("align_corners", 0)
        n, c, h, w = x.shape
        gx = grid[..., 0]
        gy = grid[..., 1]
        if align:
            fx = (gx + 1) * 0.5 * (w - 1)
            fy = (gy + 1) * 0.5 * (h - 1)
        else:
            fx = ((gx + 1) * w - 1) * 0.5
            fy = ((gy + 1) * h - 1) * 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0

        def sample(ix, iy):
            inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
            flat = x.reshape(n, c, h * w)
            lin = (iyc * w + ixc).reshape(n, -1)
            vals = jnp.take_along_axis(
                flat, lin[:, None, :].repeat(c, axis=1), axis=2
            )
            vals = vals.reshape((n, c) + ix.shape[1:])
            return vals * inb[:, None].astype(x.dtype)

        v00 = sample(x0, y0)
        v01 = sample(x0 + 1, y0)
        v10 = sample(x0, y0 + 1)
        v11 = sample(x0 + 1, y0 + 1)
        wx = wx[:, None]
        wy = wy[:, None]
        return (
            v00 * (1 - wx) * (1 - wy)
            + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy
            + v11 * wx * wy
        )


    # -- control flow -----------------------------------------------------------

    def op_If(self, node, xs):
        outer = dict(self._env)
        then_g = node.attrs["then_branch"]
        else_g = node.attrs["else_branch"]
        cond = xs[0]
        if _is_static(cond):
            # resolved at trace time: only the taken branch is traced
            g = then_g if bool(_np(cond)) else else_g
            return tuple(self._run_subgraph(g, [], outer))

        def make(g):
            def branch(_):
                outs = self._run_subgraph(g, [], outer)
                return tuple(jnp.asarray(o) for o in outs)

            return branch

        return jax.lax.cond(
            jnp.asarray(cond).reshape(()),
            make(then_g), make(else_g), None,
        )

    def op_Loop(self, node, xs):
        """ONNX Loop -> lax.while_loop with preallocated scan buffers.

        Requires a static max trip count M (AR decoder exports bound the
        loop by max sequence length, so this holds for the target graphs:
        SLANet-style structure decoders). Carried values must keep fixed
        shapes/dtypes across iterations (lax.while_loop invariant). Scan
        outputs are stacked into length-M buffers; iterations past the
        data-dependent exit keep their zero padding — ONNX proper truncates
        to the trip count, so consumers see padded rows where onnxruntime
        would see fewer. The engine's CTC/token decoders already stop at
        EOS, so padding is benign for the decode use-case.
        """
        outer = dict(self._env)
        body = node.attrs["body"]
        m_in = xs[0] if xs else None
        cond_in = xs[1] if len(xs) > 1 else None
        if m_in is None or not _is_static(m_in):
            raise NotImplementedError(
                "Loop requires a static max trip count"
            )
        m = int(_np(m_in))
        carried0 = tuple(jnp.asarray(c) for c in xs[2:])
        n_c = len(carried0)
        n_scan = len(node.outputs) - n_c
        cond0 = jnp.asarray(
            True if cond_in is None else cond_in
        ).reshape(()).astype(bool)

        def body_call(i, cond, carried):
            outs = self._run_subgraph(body, [i, cond] + list(carried), outer)
            cond_out = outs[0]
            if cond_out is None:  # empty cond output name: run all M
                cond_out = cond
            new_carried = tuple(
                jnp.asarray(o).astype(c.dtype)
                for o, c in zip(outs[1 : 1 + n_c], carried)
            )
            scans = tuple(jnp.asarray(o) for o in outs[1 + n_c :])
            return (
                jnp.asarray(cond_out).reshape(()).astype(bool),
                new_carried,
                scans,
            )

        _, _, scan_spec = jax.eval_shape(
            body_call, jnp.zeros((), jnp.int32), cond0, carried0
        )
        scan_bufs = tuple(
            jnp.zeros((m,) + tuple(s.shape), s.dtype) for s in scan_spec
        )

        def cond_fn(state):
            i, cond, _, _ = state
            return (i < m) & cond

        def body_fn(state):
            i, cond, carried, bufs = state
            cond_out, new_carried, scans = body_call(i, cond, carried)
            bufs = tuple(
                b.at[i].set(v) for b, v in zip(bufs, scans)
            )
            return i + 1, cond_out, new_carried, bufs

        if m == 0:
            final_carried, final_bufs = carried0, scan_bufs
        else:
            _, _, final_carried, final_bufs = jax.lax.while_loop(
                cond_fn, body_fn,
                (jnp.zeros((), jnp.int32), cond0, carried0, scan_bufs),
            )
        assert n_scan == len(final_bufs)
        return tuple(final_carried) + tuple(final_bufs)


def _static_float_operands(model) -> set[str]:
    """Names feeding shape-like float inputs (Resize scales/sizes), which
    must resolve at trace time even though they are float initializers —
    real exports (UNET upsample paths) ship Resize scales as float32
    initializers, not graph constants. Recurses into If/Loop subgraphs:
    a branch may consume an outer-scope initializer."""
    names: set[str] = set()
    for node in model.nodes:
        if node.op_type == "Resize":
            for idx in (2, 3):
                if len(node.inputs) > idx and node.inputs[idx]:
                    names.add(node.inputs[idx])
        for v in node.attrs.values():
            if hasattr(v, "nodes"):  # subgraph attribute
                names |= _static_float_operands(v)
    return names


class OnnxJaxFunction:
    """A jittable callable over an ONNX graph: fn(inputs_dict) -> outputs.

    Weights live as a device-side params dict (donated to jit as a captured
    constant-free argument), so multiple shape buckets share one weight
    copy. A jit cache keyed by input shapes keeps recompiles at
    O(#buckets).
    """

    def __init__(self, model: OnnxModel, preproc: dict | None = None):
        """`preproc` maps input name -> device-side fn applied in-graph
        before the ONNX ops — callers ship uint8 and normalization fuses
        into the first conv (host->device bytes are the bottleneck on a
        tunneled chip, and float32 image feeds are 4x uint8)."""
        self.model = model
        self.executor = _Executor(model)
        self.preproc = preproc or {}
        # Float tensors ride as jit arguments (device-resident, shared by
        # all shape buckets); integer/bool tensors stay static numpy so
        # Shape/Reshape/Slice chains resolve at trace time.
        self.params: dict[str, np.ndarray] = {}
        self.static: dict[str, np.ndarray] = {}
        force_static = _static_float_operands(model)
        for k, v in model.initializers.items():
            arr = np.asarray(v)
            if np.issubdtype(arr.dtype, np.floating) and k not in force_static:
                self.params[k] = arr
            else:
                self.static[k] = arr
        self._jitted: dict[tuple, Callable] = {}

    @classmethod
    def from_file(cls, path, preproc: dict | None = None) -> "OnnxJaxFunction":
        return cls(read_onnx_model(path), preproc=preproc)

    @property
    def input_names(self):
        return self.model.input_names

    def __call__(self, *arrays) -> list[np.ndarray]:
        inputs = dict(zip(self.model.input_names, arrays))
        key = tuple(
            (n, tuple(v.shape), str(np.asarray(v).dtype))
            for n, v in inputs.items()
        )
        fn = self._jitted.get(key)
        if fn is None:
            def run(params, inp):
                inp = {
                    k: (self.preproc[k](v) if k in self.preproc else v)
                    for k, v in inp.items()
                }
                return self.executor.run({**self.static, **params}, inp)

            fn = jax.jit(run)
            self._jitted[key] = fn
        from .flops import track

        track(
            getattr(self, "name", "onnx"), fn, (self.params, inputs),
            sig=key,
        )
        out = fn(self.params, {k: jnp.asarray(v) for k, v in inputs.items()})
        return [np.asarray(o) for o in out]
