"""Gradient parity of the fused decoder-layer kernels (custom VJP,
recompute-in-VMEM) against plain-XLA reference compositions — the r5
training fast path (VERDICT r4 #2). Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsasr_tpu.ops.fused_layers import ln_attn_proj, ln_mlp_residual


def _ln_ref(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _mlp_ref(x, p, inj=None, resi=None, zero_base=False, has_ln=True):
    t = x + (inj[:, None, :] if inj is not None else 0.0)
    h = _ln_ref(t, p["ln_w"], p["ln_b"]) if has_ln else t
    z = jnp.maximum(h @ p["w1"] + p["b1"], 0.0) @ p["w2"] + p["b2"]
    base = 0.0 if zero_base else (resi if resi is not None else t)
    return base + z


def _attn_ref(x, p, num_heads, pos=None, kv=None, bias=None,
              rope=None):
    b, tq, c = x.shape
    hd = c // num_heads
    xq = _ln_ref(x, p["ln_w"], p["ln_b"])
    if pos is not None:
        xq = xq + pos[None]
    src = kv if kv is not None else xq
    q = xq @ p["wq"] + p["bq"]
    k = src @ p["wk"] + p["bk"]
    v = src @ p["wv"] + p["bv"]
    if rope is not None:
        cq, sq, ck, sk = rope

        def rot(z, cos, sin):
            zr = z.reshape(*z.shape[:-1], c // 2, 2)
            zs = jnp.stack([-zr[..., 1], zr[..., 0]],
                           axis=-1).reshape(z.shape)
            return z * cos[None] + zs * sin[None]

        q = rot(q, cq, sq)
        k = rot(k, ck, sk)
    tk = k.shape[1]
    qh = q.reshape(b, tq, num_heads, hd)
    kh = k.reshape(b, tk, num_heads, hd)
    vh = v.reshape(b, tk, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (hd ** -0.5)
    if bias is not None:
        s = s + bias[None]
    pr = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", pr, vh).reshape(b, tq, c)
    return o @ p["wo"] + p["bo"]


def _grad_compare(loss_fused, loss_ref, args, rtol=2e-3, atol=2e-3):
    vf, gf = jax.value_and_grad(loss_fused)(args)
    vr, gr = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-4)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gr))
    for path, leaf in flat_f:
        ref = flat_r[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("mode", ["inj_ln", "plain", "resi", "zero_base"])
def test_ln_mlp_residual_grads(mode):
    rng = np.random.default_rng(0)
    b, t, c, hid = 6, 16, 32, 48
    args = {
        "x": rng.standard_normal((b, t, c)).astype(np.float32),
        "p": {
            "ln_w": rng.standard_normal(c).astype(np.float32),
            "ln_b": rng.standard_normal(c).astype(np.float32),
            "w1": (rng.standard_normal((c, hid)) / np.sqrt(c)).astype(
                np.float32),
            "b1": rng.standard_normal(hid).astype(np.float32),
            "w2": (rng.standard_normal((hid, c)) / np.sqrt(hid)).astype(
                np.float32),
            "b2": rng.standard_normal(c).astype(np.float32),
        },
        "inj": rng.standard_normal((b, c)).astype(np.float32),
        "resi": rng.standard_normal((b, t, c)).astype(np.float32),
        "w": rng.standard_normal((b, t, c)).astype(np.float32),
    }
    args = jax.tree_util.tree_map(jnp.asarray, args)
    has_ln = mode != "plain"
    inj = mode == "inj_ln"
    resi = mode == "resi"
    zb = mode == "zero_base"

    def loss_fused(a):
        kw = dict(w1=a["p"]["w1"], b1=a["p"]["b1"], w2=a["p"]["w2"],
                  b2=a["p"]["b2"])
        if has_ln:
            kw.update(ln_w=a["p"]["ln_w"], ln_b=a["p"]["ln_b"])
        out = ln_mlp_residual(a["x"], inj=a["inj"] if inj else None,
                              resi=a["resi"] if resi else None,
                              zero_base=zb, **kw)
        return jnp.sum(a["w"] * jnp.tanh(out))

    def loss_ref(a):
        out = _mlp_ref(a["x"], a["p"], inj=a["inj"] if inj else None,
                       resi=a["resi"] if resi else None, zero_base=zb,
                       has_ln=has_ln)
        return jnp.sum(a["w"] * jnp.tanh(out))

    _grad_compare(loss_fused, loss_ref, args)


@pytest.mark.parametrize("mode", ["self_bias", "cross_pos_bias",
                                  "self_rope", "cross_pos_rope"])
def test_ln_attn_proj_grads(mode):
    rng = np.random.default_rng(1)
    b, tq, c, nh = 6, 16, 32, 4
    tk = 16 if mode.startswith("self") else 24
    mk = lambda *s: jnp.asarray(
        (rng.standard_normal(s) / np.sqrt(s[0] if len(s) > 1 else 1)
         ).astype(np.float32))
    args = {
        "x": mk(b, tq, c) * np.sqrt(b),
        "kv": mk(b, tk, c) * np.sqrt(b),
        "pos": mk(tq, c),
        "bias": mk(nh, tq, tk),
        # pair-duplicated tables (cos/sin constant within each complex
        # pair) — the production layout the kernel's rotation transpose
        # assumes (see _rope_tables in models/fea2gs_rope_fast.py)
        "rope": tuple(
            jnp.asarray(np.repeat(
                rng.standard_normal((n, c // 2)).astype(np.float32), 2,
                axis=-1))
            for n in (tq, tq, tk, tk)),
        "p": {"ln_w": mk(c), "ln_b": mk(c), "wq": mk(c, c), "bq": mk(c),
              "wk": mk(c, c), "bk": mk(c), "wv": mk(c, c), "bv": mk(c),
              "wo": mk(c, c), "bo": mk(c)},
        "w": mk(b, tq, c),
    }
    cross = mode.startswith("cross")
    has_rope = mode.endswith("rope")
    has_bias = mode.endswith("bias")

    def loss_fused(a):
        kw = {}
        if cross:
            kw.update(kv=a["kv"], pos=a["pos"])
        if has_bias:
            kw["bias"] = a["bias"]
        if has_rope:
            cq, sq, ck, sk = a["rope"]
            kw.update(rope_cos_q=cq, rope_sin_q=sq, rope_cos_k=ck,
                      rope_sin_k=sk)
        out = ln_attn_proj(a["x"], num_heads=nh, **a["p"], **kw)
        return jnp.sum(a["w"] * jnp.tanh(out))

    def loss_ref(a):
        out = _attn_ref(a["x"], a["p"], nh,
                        pos=a["pos"] if cross else None,
                        kv=a["kv"] if cross else None,
                        bias=a["bias"] if has_bias else None,
                        rope=a["rope"] if has_rope else None)
        return jnp.sum(a["w"] * jnp.tanh(out))

    _grad_compare(loss_fused, loss_ref, args)


def test_fused_decoder_full_grad_parity():
    """End-to-end: grads of a loss on `fea2gs_apply_fused` match the
    module path on the same parameter tree."""
    from gsasr_tpu.models import Fea2GS
    from gsasr_tpu.models.fea2gs_fast import fea2gs_apply_fused

    m = Fea2GS(inchannel=8, channel=24, num_heads=4, num_crossattn_blocks=1,
               num_crossattn_layers=2, num_selfattn_blocks=1,
               num_selfattn_layers=2, num_gs_seed=16, window_size=4)
    rng = np.random.default_rng(2)
    srcs = jnp.asarray(rng.random((1, 8, 8, 8), dtype=np.float32))
    scale = jnp.full((1,), 2.0, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), srcs, scale)["params"]
    w = jnp.asarray(rng.random((1, 1024, 9), dtype=np.float32))

    def loss_mod(p):
        return jnp.sum(w * m.apply({"params": p}, srcs, scale))

    def loss_fused(p):
        return jnp.sum(w * fea2gs_apply_fused(m, {"params": p}, srcs,
                                              scale))

    vm, gm = jax.value_and_grad(loss_mod)(params)
    vf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(vf), float(vm), rtol=1e-5)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(gm))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gf):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_m[path]), rtol=3e-3,
            atol=3e-3, err_msg=jax.tree_util.keystr(path))


def test_fused_rope_decoder_full_grad_parity():
    """End-to-end: grads of a loss on `fea2gs_rope_apply_fused` match the
    Enhanced module path (RoPE freq gradients included)."""
    from gsasr_tpu.models.fea2gs_rope import Fea2GSRopeAMP
    from gsasr_tpu.models.fea2gs_rope_fast import fea2gs_rope_apply_fused

    m = Fea2GSRopeAMP(inchannel=8, channel=32, num_heads=4,
                      num_crossattn_blocks=1, num_crossattn_layers=2,
                      num_selfattn_blocks=1, num_selfattn_layers=2,
                      num_gs_seed=16, window_size=4)
    rng = np.random.default_rng(3)
    srcs = jnp.asarray(rng.random((1, 8, 8, 8), dtype=np.float32))
    scale = jnp.full((1,), 2.0, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), srcs, scale)["params"]
    w = jnp.asarray(rng.random((1, 1024, 9), dtype=np.float32))

    def loss_mod(p):
        return jnp.sum(w * m.apply({"params": p}, srcs, scale))

    def loss_fused(p):
        return jnp.sum(w * fea2gs_rope_apply_fused(m, {"params": p}, srcs,
                                                   scale))

    vm, gm = jax.value_and_grad(loss_mod)(params)
    vf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(vf), float(vm), rtol=1e-5)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(gm))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gf):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_m[path]), rtol=3e-3,
            atol=3e-3, err_msg=jax.tree_util.keystr(path))
