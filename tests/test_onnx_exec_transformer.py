"""Executor vs torch on a full transformer block built the way exporters
actually emit it: decomposed LayerNorm (ReduceMean/Sub/Pow/Sqrt/Div),
fused-QKV MatMul + Split + Transpose attention with an additive Where
mask, Erf-based GELU. This is the op mix the real catalog bundles use."""

import numpy as np
import pytest

import onnx_builder as ob
from crispy_tpu.models.onnx_exec import OnnxRunner

F32, I64, BOOL = 1, 7, 9


def decomposed_layernorm(prefix, x_name, g_name, b_name, out_name, eps=1e-5):
    """The torch.onnx pre-opset-17 LayerNorm pattern."""
    p = prefix
    return [
        ob.node("ReduceMean", [x_name, f"{p}_ax"], [f"{p}_mu"], keepdims=1),
        ob.node("Sub", [x_name, f"{p}_mu"], [f"{p}_c"]),
        ob.node("Pow", [f"{p}_c", f"{p}_two"], [f"{p}_sq"]),
        ob.node("ReduceMean", [f"{p}_sq", f"{p}_ax"], [f"{p}_var"], keepdims=1),
        ob.node("Add", [f"{p}_var", f"{p}_eps"], [f"{p}_ve"]),
        ob.node("Sqrt", [f"{p}_ve"], [f"{p}_std"]),
        ob.node("Div", [f"{p}_c", f"{p}_std"], [f"{p}_n"]),
        ob.node("Mul", [f"{p}_n", g_name], [f"{p}_s"]),
        ob.node("Add", [f"{p}_s", b_name], [out_name]),
    ], {
        f"{p}_ax": np.array([-1], np.int64), f"{p}_two": np.float32(2.0),
        f"{p}_eps": np.float32(eps),
    }


def erf_gelu(prefix, x_name, out_name):
    """x * 0.5 * (1 + erf(x / sqrt(2))) — the exported GELU."""
    p = prefix
    return [
        ob.node("Div", [x_name, f"{p}_s2"], [f"{p}_d"]),
        ob.node("Erf", [f"{p}_d"], [f"{p}_e"]),
        ob.node("Add", [f"{p}_e", f"{p}_one"], [f"{p}_e1"]),
        ob.node("Mul", [x_name, f"{p}_e1"], [f"{p}_xe"]),
        ob.node("Mul", [f"{p}_xe", f"{p}_half"], [out_name]),
    ], {
        f"{p}_s2": np.float32(np.sqrt(2.0)), f"{p}_one": np.float32(1.0),
        f"{p}_half": np.float32(0.5),
    }


def test_transformer_block_matches_torch(tmp_path):
    torch = pytest.importorskip("torch")
    B, T, D, H = 2, 6, 16, 4
    hd = D // H
    rng = np.random.default_rng(0)
    wqkv = rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.3
    wo = rng.standard_normal((D, D)).astype(np.float32) * 0.3
    w1 = rng.standard_normal((D, 4 * D)).astype(np.float32) * 0.3
    w2 = rng.standard_normal((4 * D, D)).astype(np.float32) * 0.3
    g1, b1 = (rng.standard_normal(D).astype(np.float32),
              rng.standard_normal(D).astype(np.float32))
    g2, b2 = (rng.standard_normal(D).astype(np.float32),
              rng.standard_normal(D).astype(np.float32))
    causal = np.tril(np.ones((T, T), bool))

    ln1_nodes, ln1_init = decomposed_layernorm("ln1", "x", "g1", "b1", "h1")
    ln2_nodes, ln2_init = decomposed_layernorm("ln2", "res1", "g2", "b2", "h2")
    gelu_nodes, gelu_init = erf_gelu("gelu", "ff1", "ffa")
    nodes = ln1_nodes + [
        ob.node("MatMul", ["h1", "wqkv"], ["qkv"]),
        ob.node("Split", ["qkv"], ["q", "k", "v"], axis=-1, num_outputs=3),
        # [B,T,D] → [B,H,T,hd]
        ob.node("Reshape", ["q", "hshape"], ["q4"]),
        ob.node("Transpose", ["q4"], ["qh"], perm=[0, 2, 1, 3]),
        ob.node("Reshape", ["k", "hshape"], ["k4"]),
        ob.node("Transpose", ["k4"], ["kh"], perm=[0, 2, 3, 1]),
        ob.node("Reshape", ["v", "hshape"], ["v4"]),
        ob.node("Transpose", ["v4"], ["vh"], perm=[0, 2, 1, 3]),
        ob.node("MatMul", ["qh", "kh"], ["scores0"]),
        ob.node("Div", ["scores0", "scale"], ["scores"]),
        ob.node("Where", ["mask", "scores", "neg"], ["masked"]),
        ob.node("Softmax", ["masked"], ["attn"], axis=-1),
        ob.node("MatMul", ["attn", "vh"], ["ctx"]),
        ob.node("Transpose", ["ctx"], ["ctx2"], perm=[0, 2, 1, 3]),
        ob.node("Reshape", ["ctx2", "dshape"], ["ctx3"]),
        ob.node("MatMul", ["ctx3", "wo"], ["proj"]),
        ob.node("Add", ["x", "proj"], ["res1"]),
    ] + ln2_nodes + [
        ob.node("MatMul", ["h2", "w1"], ["ff1"]),
    ] + gelu_nodes + [
        ob.node("MatMul", ["ffa", "w2"], ["ff2"]),
        ob.node("Add", ["res1", "ff2"], ["y"]),
    ]
    inits = {
        "wqkv": wqkv, "wo": wo, "w1": w1, "w2": w2,
        "g1": g1, "b1": b1, "g2": g2, "b2": b2,
        "hshape": np.array([B, T, H, hd], np.int64),
        "dshape": np.array([B, T, D], np.int64),
        "scale": np.float32(np.sqrt(hd)),
        "neg": np.float32(-1e9),
        "mask": causal[None, None],
    }
    inits.update(ln1_init)
    inits.update(ln2_init)
    inits.update(gelu_init)
    p = tmp_path / "block.onnx"
    ob.write_model(p, nodes, [("x", F32, [B, T, D])], [("y", F32, [B, T, D])], inits)
    runner = OnnxRunner.load(p).validate()

    x = rng.standard_normal((B, T, D)).astype(np.float32)
    got = np.asarray(runner(x=x)["y"])

    # torch reference
    tx = torch.from_numpy(x)
    h1 = torch.nn.functional.layer_norm(tx, (D,), torch.from_numpy(g1), torch.from_numpy(b1))
    qkv = h1 @ torch.from_numpy(wqkv)
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(m):
        return m.reshape(B, T, H, hd).permute(0, 2, 1, 3)

    scores = heads(q) @ heads(k).transpose(-1, -2) / np.sqrt(hd)
    scores = scores.masked_fill(~torch.from_numpy(causal)[None, None], -1e9)
    ctx = torch.softmax(scores, dim=-1) @ heads(v)
    proj = ctx.permute(0, 2, 1, 3).reshape(B, T, D) @ torch.from_numpy(wo)
    res1 = tx + proj
    h2 = torch.nn.functional.layer_norm(res1, (D,), torch.from_numpy(g2), torch.from_numpy(b2))
    ff = torch.nn.functional.gelu(h2 @ torch.from_numpy(w1)) @ torch.from_numpy(w2)
    want = (res1 + ff).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_jitted_transformer_block(tmp_path):
    """The same graph compiles under jax.jit with a traced input."""
    import jax

    torch = pytest.importorskip("torch")
    # reuse the builder through the other test's graph
    test_transformer_block_matches_torch(tmp_path)
    runner = OnnxRunner.load(tmp_path / "block.onnx")
    x = np.random.default_rng(1).standard_normal((2, 6, 16)).astype(np.float32)
    eager = np.asarray(runner(x=x)["y"])
    jitted = np.asarray(jax.jit(lambda v: runner(x=v)["y"])(x))
    np.testing.assert_allclose(jitted, eager, atol=1e-5)
