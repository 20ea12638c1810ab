"""RT-DETR detector in flax (PP-DocLayout family).

The reference runs PP-DocLayout as an opaque ONNX graph (reference:
rapid_doc/model/layout/rapid_layout_self/model_handler/pp_doclayout/
main.py — 800x800 input, output rows (cls, score, x0, y0, x1, y1) scaled
by a scale_factor input; V2/V3 row order IS the reading order). This is a
from-scratch TPU-first implementation of that architecture class
(RT-DETR: hybrid encoder with AIFI + CCFF, deformable-attention decoder
with query selection), with the deformable sampling expressed as batched
gathers so XLA keeps everything on-device.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common.layers import ConvBNAct, act_fn
from .hgnet import PPHGNetV2


# ----------------------------------------------------------------- helpers

def sincos_pos_embed_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2D sine-cosine positional embedding, (h*w, dim)."""
    grid_w = jnp.arange(w, dtype=jnp.float32)
    grid_h = jnp.arange(h, dtype=jnp.float32)
    gw, gh = jnp.meshgrid(grid_w, grid_h)
    pos_dim = dim // 4
    omega = jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden, name=f"fc{i}")(x))
        return nn.Dense(self.out, name=f"fc{self.layers - 1}")(x)


# ------------------------------------------------------------ hybrid encoder

class TransformerEncoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    ffn: int = 1024

    @nn.compact
    def __call__(self, x, pos):
        q = k = x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn"
        )(q, k, x)
        x = nn.LayerNorm(name="norm1", dtype=x.dtype)(x + attn)
        h = nn.Dense(self.ffn, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return nn.LayerNorm(name="norm2", dtype=x.dtype)(x + h)


class RepBlock(nn.Module):
    """Inference-fused RepVGG-style 3x3 conv block (conv+BN+SiLU)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return ConvBNAct(self.features, 3, act="silu", name="conv")(x)


class CSPRepLayer(nn.Module):
    features: int
    num_blocks: int = 3

    @nn.compact
    def __call__(self, x):
        a = ConvBNAct(self.features, 1, act="silu", name="conv1")(x)
        b = ConvBNAct(self.features, 1, act="silu", name="conv2")(x)
        for i in range(self.num_blocks):
            a = RepBlock(self.features, name=f"bottleneck{i}")(a)
        return ConvBNAct(self.features, 1, act="silu", name="conv3")(a + b)


class HybridEncoder(nn.Module):
    """AIFI on the stride-32 level + CCFF cross-scale fusion."""

    dim: int = 256
    heads: int = 8
    ffn: int = 1024
    csp_blocks: int = 3

    @nn.compact
    def __call__(self, feats: list[jax.Array]) -> list[jax.Array]:
        # project all levels to self.dim
        proj = [
            ConvBNAct(self.dim, 1, act=None, name=f"input_proj{i}")(f)
            for i, f in enumerate(feats)
        ]
        # AIFI on the smallest level
        c5 = proj[-1]
        b, h, w, c = c5.shape
        tokens = c5.reshape(b, h * w, c)
        pos = sincos_pos_embed_2d(h, w, self.dim).astype(tokens.dtype)[None]
        tokens = TransformerEncoderLayer(
            self.dim, self.heads, self.ffn, name="aifi"
        )(tokens, pos)
        proj[-1] = tokens.reshape(b, h, w, c)

        # top-down (FPN)
        n = len(proj)
        inner = [None] * n
        inner[-1] = proj[-1]
        for i in range(n - 2, -1, -1):
            upper = ConvBNAct(self.dim, 1, act="silu", name=f"lateral{i}")(
                inner[i + 1]
            )
            up = jnp.repeat(jnp.repeat(upper, 2, axis=1), 2, axis=2)
            merged = jnp.concatenate([up, proj[i]], axis=-1)
            inner[i] = CSPRepLayer(
                self.dim, self.csp_blocks, name=f"fpn_block{i}"
            )(merged)
            inner[i + 1] = upper  # RT-DETR keeps the lateral as the new level
        # bottom-up (PAN)
        outs = [inner[0]]
        for i in range(n - 1):
            down = ConvBNAct(
                self.dim, 3, strides=2, act="silu", name=f"downsample{i}"
            )(outs[-1])
            merged = jnp.concatenate([down, inner[i + 1]], axis=-1)
            outs.append(
                CSPRepLayer(self.dim, self.csp_blocks, name=f"pan_block{i}")(merged)
            )
        return outs


# ------------------------------------------------- deformable attention

def ms_deform_sample(
    values: list[jax.Array],
    sampling_locs: jax.Array,
    attn_weights: jax.Array,
) -> jax.Array:
    """Multi-scale deformable attention aggregation.

    values: per-level (B, H_l, W_l, heads, head_dim)
    sampling_locs: (B, Nq, heads, L, P, 2) in [0,1] normalized coords (x, y)
    attn_weights: (B, Nq, heads, L, P) softmaxed
    returns (B, Nq, heads*head_dim)
    """
    B, Nq, H, L, P, _ = sampling_locs.shape
    head_dim = values[0].shape[-1]
    out = jnp.zeros((B, Nq, H, head_dim), dtype=values[0].dtype)
    for lvl, val in enumerate(values):
        _, Hl, Wl, _, _ = val.shape
        loc = sampling_locs[:, :, :, lvl]  # (B,Nq,H,P,2)
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0

        head_ids = jnp.arange(H, dtype=jnp.int32)[None, None, :, None]

        def gather(ix, iy):
            ixc = jnp.clip(ix.astype(jnp.int32), 0, Wl - 1)
            iyc = jnp.clip(iy.astype(jnp.int32), 0, Hl - 1)
            # fold the head axis into the gather index so each head reads
            # its own slice in one take_along_axis
            flat = val.reshape(B, Hl * Wl * H, head_dim)
            idx = (iyc * Wl + ixc) * H + head_ids  # (B,Nq,H,P)
            g = jnp.take_along_axis(
                flat, idx.reshape(B, -1)[..., None], axis=1
            )
            return g.reshape(B, Nq, H, P, head_dim)

        v00 = gather(x0, y0)
        v01 = gather(x0 + 1, y0)
        v10 = gather(x0, y0 + 1)
        v11 = gather(x0 + 1, y0 + 1)
        wx_ = wx[..., None]
        wy_ = wy[..., None]
        sampled = (
            v00 * (1 - wx_) * (1 - wy_)
            + v01 * wx_ * (1 - wy_)
            + v10 * (1 - wx_) * wy_
            + v11 * wx_ * wy_
        )  # (B,Nq,H,P,head_dim)
        # zero out-of-range samples
        valid = (
            (x >= -1) & (x <= Wl) & (y >= -1) & (y <= Hl)
        )[..., None].astype(sampled.dtype)
        sampled = sampled * valid
        w = attn_weights[:, :, :, lvl][..., None]  # (B,Nq,H,P,1)
        out = out + (sampled * w).sum(axis=3)
    return out.reshape(B, Nq, H * head_dim)


class MSDeformAttn(nn.Module):
    dim: int = 256
    heads: int = 8
    levels: int = 3
    points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jax.Array,          # (B, Nq, C)
        ref_points: jax.Array,     # (B, Nq, 2) or (B, Nq, 4) normalized
        value_levels: list[jax.Array],  # per level (B, H, W, C)
    ) -> jax.Array:
        B, Nq, C = query.shape
        head_dim = self.dim // self.heads
        # single shared value projection applied per level
        vproj = nn.Dense(self.dim, name="value_proj")
        values = [
            vproj(v).reshape(v.shape[0], v.shape[1], v.shape[2], self.heads, head_dim)
            for v in value_levels
        ]
        offsets = nn.Dense(
            self.heads * self.levels * self.points * 2, name="sampling_offsets"
        )(query).reshape(B, Nq, self.heads, self.levels, self.points, 2)
        attn = nn.Dense(
            self.heads * self.levels * self.points, name="attention_weights"
        )(query).reshape(B, Nq, self.heads, self.levels * self.points)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(query.dtype)
        attn = attn.reshape(B, Nq, self.heads, self.levels, self.points)

        if ref_points.shape[-1] == 4:
            center = ref_points[..., :2]
            wh = ref_points[..., 2:]
            locs = (
                center[:, :, None, None, None, :]
                + offsets / self.points * wh[:, :, None, None, None, :] * 0.5
            )
        else:
            shapes = jnp.asarray(
                [[v.shape[2], v.shape[1]] for v in value_levels],
                dtype=query.dtype,
            )  # (L, 2) as (W, H)
            locs = (
                ref_points[:, :, None, None, None, :]
                + offsets / shapes[None, None, None, :, None, :]
            )
        out = ms_deform_sample(values, locs, attn)
        return nn.Dense(self.dim, name="output_proj")(out)


class DecoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    ffn: int = 1024
    levels: int = 3
    points: int = 4

    @nn.compact
    def __call__(self, tgt, query_pos, ref_points, value_levels):
        q = k = tgt + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="self_attn"
        )(q, k, tgt)
        tgt = nn.LayerNorm(name="norm1", dtype=tgt.dtype)(tgt + attn)
        cross = MSDeformAttn(
            self.dim, self.heads, self.levels, self.points, name="cross_attn"
        )(tgt + query_pos, ref_points, value_levels)
        tgt = nn.LayerNorm(name="norm2", dtype=tgt.dtype)(tgt + cross)
        h = nn.Dense(self.ffn, name="fc1")(tgt)
        h = jax.nn.relu(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        return nn.LayerNorm(name="norm3", dtype=tgt.dtype)(tgt + h)


class RTDETR(nn.Module):
    """Full detector. Input NHWC in [0,1]; output dict with per-query
    scores/labels/boxes (cxcywh normalized), in score order (the decoder's
    query order serves as the reading-order signal, as in PP-DocLayoutV2/V3).
    """

    num_classes: int = 25
    backbone_size: str = "B4"
    dim: int = 256
    num_queries: int = 300
    dec_layers: int = 6
    heads: int = 8
    ffn: int = 1024
    points: int = 4
    # V3 irregular-region instance masks (reference: PP-DocLayoutV3's
    # mask branch, post_process.py mask2polygon :400): per-query mask
    # embedding dotted with a stride-8 pixel feature map.
    with_masks: bool = False
    mask_dim: int = 32
    # training mode: also emit per-decoder-layer logits/boxes and the
    # encoder query-selection head's predictions (DETR aux losses; the
    # enc head gets NO gradient otherwise because tgt/ref are detached
    # after query selection). Adds no parameters — checkpoints are
    # interchangeable with aux=False.
    aux: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        feats = PPHGNetV2(self.backbone_size, name="backbone")(x)
        levels = HybridEncoder(self.dim, self.heads, self.ffn, name="encoder")(feats)
        B = x.shape[0]
        L = len(levels)

        # flatten memory + per-level anchors
        memories = []
        anchors = []
        for lvl, f in enumerate(levels):
            b, h, w, c = f.shape
            memories.append(f.reshape(b, h * w, c))
            gy, gx = jnp.meshgrid(
                (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
                (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
                indexing="ij",
            )
            wh = jnp.full((h * w, 2), 0.05 * (2.0**lvl), dtype=jnp.float32)
            anchor = jnp.concatenate(
                [gx.reshape(-1, 1), gy.reshape(-1, 1), wh], axis=1
            )
            anchors.append(anchor)
        memory = jnp.concatenate(memories, axis=1)  # (B, S, C)
        anchor = jnp.concatenate(anchors, axis=0)[None]  # (1, S, 4)
        anchor = jnp.broadcast_to(anchor, (B,) + anchor.shape[1:]).astype(memory.dtype)

        # encoder-side query selection
        enc_feat = nn.LayerNorm(name="enc_norm", dtype=memory.dtype)(
            nn.Dense(self.dim, name="enc_proj")(memory)
        )
        enc_logits = nn.Dense(self.num_classes, name="enc_score_head")(enc_feat)
        enc_boxes = MLP(self.dim, 4, name="enc_bbox_head")(enc_feat)
        enc_boxes = jax.nn.sigmoid(
            enc_boxes.astype(jnp.float32) + inverse_sigmoid(anchor.astype(jnp.float32))
        )
        enc_scores = jnp.max(
            jax.nn.sigmoid(enc_logits.astype(jnp.float32)), axis=-1
        )  # (B, S)
        topk = jax.lax.top_k(enc_scores, self.num_queries)[1]  # (B, Nq)
        ref = jnp.take_along_axis(enc_boxes, topk[..., None], axis=1)  # (B,Nq,4)
        tgt = jnp.take_along_axis(enc_feat, topk[..., None], axis=1)
        tgt = jax.lax.stop_gradient(tgt)
        ref = jax.lax.stop_gradient(ref)

        query_pos_head = MLP(self.dim * 2, self.dim, name="query_pos_head")
        class_head = nn.Dense(self.num_classes, name="class_head")
        aux_feats: list[jax.Array] = []
        aux_boxes: list[jax.Array] = []
        for i in range(self.dec_layers):
            query_pos = query_pos_head(ref.astype(tgt.dtype))
            tgt = DecoderLayer(
                self.dim, self.heads, self.ffn, L, self.points,
                name=f"decoder{i}",
            )(tgt, query_pos, ref, levels)
            delta = MLP(self.dim, 4, name=f"bbox_head{i}")(tgt)
            ref = jax.nn.sigmoid(
                delta.astype(jnp.float32) + inverse_sigmoid(ref.astype(jnp.float32))
            )
            if self.aux:
                aux_feats.append(tgt)
                aux_boxes.append(ref)
            ref = jax.lax.stop_gradient(ref) if i < self.dec_layers - 1 else ref

        logits = class_head(tgt)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        scores = jnp.max(probs, axis=-1)
        labels = jnp.argmax(probs, axis=-1)
        out = {
            "scores": scores,          # (B, Nq)
            "labels": labels,          # (B, Nq)
            "boxes": ref,              # (B, Nq, 4) cxcywh in [0,1]
        }
        if self.aux:
            out["aux_logits"] = jnp.stack(
                [class_head(f) for f in aux_feats]
            )  # (L, B, Nq, C)
            out["aux_boxes"] = jnp.stack(aux_boxes)  # (L, B, Nq, 4)
            out["enc_logits"] = jnp.take_along_axis(
                enc_logits, topk[..., None], axis=1
            )  # (B, Nq, C)
            out["enc_boxes"] = jnp.take_along_axis(
                enc_boxes, topk[..., None], axis=1
            )  # (B, Nq, 4)
        if self.with_masks:
            # pixel feature: finest level refined by one 3x3 conv
            pix = nn.Conv(self.mask_dim, (3, 3), padding="SAME",
                          name="mask_pixel_proj")(levels[0])
            q_emb = MLP(self.dim, self.mask_dim, name="mask_embed_head")(tgt)
            mask_logits = jnp.einsum(
                "bqc,bhwc->bqhw", q_emb, pix.astype(q_emb.dtype)
            )
            # bit-pack the thresholded masks on device: the float mask
            # stack is ~48 MB per 8-page batch and device->host readback
            # is the bottleneck on a tunneled chip; polygons only need
            # the binary mask (sigmoid(x) > .5 == x > 0)
            b, nq, mh, mw = mask_logits.shape
            pad_w = (-mw) % 8
            bits = (mask_logits > 0).astype(jnp.uint8)
            if pad_w:
                bits = jnp.pad(bits, ((0, 0), (0, 0), (0, 0), (0, pad_w)))
            bits = bits.reshape(b, nq, mh, (mw + pad_w) // 8, 8)
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
            out["masks_bits"] = jnp.sum(bits * weights, axis=-1,
                                        dtype=jnp.uint8)
        return out
