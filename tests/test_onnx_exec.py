"""ONNX→JAX executor: op semantics vs independent oracles (numpy / torch).

The executor is the guaranteed-correct path for the catalog's ONNX
artifacts (transcribe-rs engines + diarization nets). Graphs here are
built with tests/onnx_builder (hand-rolled protobuf writer) and the
outputs are compared against torch/numpy implementations of the same op.
"""

import numpy as np
import pytest

from crispy_tpu.models.onnx_exec import OnnxRunner, load_onnx_graph

import onnx_builder as ob

F32 = 1


def build(tmp_path, nodes, inputs, outputs, inits=None, name="m.onnx"):
    p = tmp_path / name
    ob.write_model(p, nodes, inputs, outputs, inits)
    return OnnxRunner.load(p)


def test_parse_roundtrip_nodes_attrs(tmp_path):
    nodes = [ob.node("Gemm", ["x", "w", "b"], ["y"], alpha=1.0, transB=1),
             ob.node("Relu", ["y"], ["z"])]
    p = tmp_path / "g.onnx"
    ob.write_model(p, nodes, [("x", F32, [2, 4])], [("z", F32, [2, 8])],
                   {"w": np.zeros((8, 4), np.float32), "b": np.zeros(8, np.float32)})
    g = load_onnx_graph(p)
    assert [n.op_type for n in g.nodes] == ["Gemm", "Relu"]
    assert g.nodes[0].attrs["transB"] == 1
    assert g.nodes[0].attrs["alpha"] == 1.0
    assert set(g.initializers) == {"w", "b"}
    assert g.outputs == ["z"]


def test_mlp_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((8, 4)).astype(np.float32)
    b1 = rng.standard_normal(8).astype(np.float32)
    w2 = rng.standard_normal((8, 3)).astype(np.float32)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    r = build(tmp_path, [
        ob.node("Gemm", ["x", "w1", "b1"], ["h"], transB=1),
        ob.node("Relu", ["h"], ["a"]),
        ob.node("MatMul", ["a", "w2"], ["y"]),
        ob.node("Softmax", ["y"], ["p"], axis=-1),
    ], [("x", F32, [5, 4])], [("p", F32, [5, 3])],
        {"w1": w1, "b1": b1, "w2": w2})
    got = np.asarray(r(x=x)["p"])
    h = np.maximum(x @ w1.T + b1, 0) @ w2
    want = np.exp(h - h.max(-1, keepdims=True))
    want /= want.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_executor_is_jittable(tmp_path):
    import jax

    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 4)).astype(np.float32)
    r = build(tmp_path, [ob.node("MatMul", ["x", "w"], ["y"])],
              [("x", F32, [2, 4])], [("y", F32, [2, 4])], {"w": w})
    x = rng.standard_normal((2, 4)).astype(np.float32)
    jitted = jax.jit(lambda x: r(x=x)["y"])
    np.testing.assert_allclose(np.asarray(jitted(x)), x @ w, atol=1e-5)


def test_shape_chain_partial_eval(tmp_path):
    """Shape→Gather→Concat→Reshape stays static and jit-compiles."""
    import jax

    r = build(tmp_path, [
        ob.node("Shape", ["x"], ["s"]),
        ob.node("Gather", ["s", "i0"], ["b"], axis=0),
        ob.node("Unsqueeze", ["b", "ax0"], ["bu"]),
        ob.node("Concat", ["bu", "m1"], ["tgt"], axis=0),
        ob.node("Reshape", ["x", "tgt"], ["y"]),
    ], [("x", F32, [3, 4, 5])], [("y", F32, [3, 20])],
        {"i0": np.array(0, np.int64), "m1": np.array([-1], np.int64),
         "ax0": np.array([0], np.int64)})
    x = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    got = jax.jit(lambda x: r(x=x)["y"])(x)
    np.testing.assert_array_equal(np.asarray(got), x.reshape(3, 20))


@pytest.mark.parametrize("stride,pad,group", [(1, 1, 1), (2, 2, 1), (1, 0, 2)])
def test_conv1d_matches_torch(tmp_path, stride, pad, group):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 20)).astype(np.float32)
    w = rng.standard_normal((6, 4 // group, 5)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    r = build(tmp_path, [ob.node("Conv", ["x", "w", "b"], ["y"],
                                 strides=[stride], pads=[pad, pad], group=group,
                                 kernel_shape=[5])],
              [("x", F32, [2, 4, 20])], [("y", F32, None)], {"w": w, "b": b})
    got = np.asarray(r(x=x)["y"])
    want = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, groups=group).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv2d_and_pools_match_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 12, 12)).astype(np.float32)
    w = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)
    r = build(tmp_path, [
        ob.node("Conv", ["x", "w"], ["c"], strides=[2, 2], pads=[1, 1, 1, 1],
                kernel_shape=[3, 3]),
        ob.node("MaxPool", ["c"], ["mp"], kernel_shape=[2, 2], strides=[2, 2]),
        ob.node("AveragePool", ["c"], ["ap"], kernel_shape=[2, 2], strides=[2, 2]),
        ob.node("GlobalAveragePool", ["c"], ["gap"]),
    ], [("x", F32, [1, 3, 12, 12])],
        [("mp", F32, None), ("ap", F32, None), ("gap", F32, None)], {"w": w})
    out = r(x=x)
    tc = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                                    stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(out["mp"]),
                               torch.nn.functional.max_pool2d(tc, 2, 2).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["ap"]),
                               torch.nn.functional.avg_pool2d(tc, 2, 2).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["gap"]),
                               tc.mean(dim=(2, 3), keepdim=True).numpy(), atol=1e-4)


def test_normalizations_match_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6, 10)).astype(np.float32)
    g = rng.standard_normal(6).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    mean = rng.standard_normal(6).astype(np.float32)
    var = np.abs(rng.standard_normal(6)).astype(np.float32) + 0.5
    gl = rng.standard_normal(10).astype(np.float32)
    bl = rng.standard_normal(10).astype(np.float32)
    r = build(tmp_path, [
        ob.node("BatchNormalization", ["x", "g", "b", "m", "v"], ["bn"]),
        ob.node("InstanceNormalization", ["x", "g", "b"], ["inorm"]),
        ob.node("LayerNormalization", ["x", "gl", "bl"], ["ln"], axis=-1),
    ], [("x", F32, [2, 6, 10])],
        [("bn", F32, None), ("inorm", F32, None), ("ln", F32, None)],
        {"g": g, "b": b, "m": mean, "v": var, "gl": gl, "bl": bl})
    out = r(x=x)
    tx = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(out["bn"]),
        torch.nn.functional.batch_norm(tx, torch.from_numpy(mean), torch.from_numpy(var),
                                       torch.from_numpy(g), torch.from_numpy(b)).numpy(),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["inorm"]),
        torch.nn.functional.instance_norm(tx, weight=torch.from_numpy(g),
                                          bias=torch.from_numpy(b)).numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["ln"]),
        torch.nn.functional.layer_norm(tx, (10,), torch.from_numpy(gl),
                                       torch.from_numpy(bl)).numpy(), atol=1e-4)


def _torch_lstm_to_onnx_weights(lstm, H):
    """torch gate order i,f,g,o → ONNX i,o,f,c; returns (W, R, B) per ONNX."""
    def reorder(m):
        i, f, g, o = np.split(m, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    Ws, Rs, Bs = [], [], []
    for sfx in ([""] if not lstm.bidirectional else ["", "_reverse"]):
        wi = reorder(getattr(lstm, f"weight_ih_l0{sfx}").detach().numpy())
        wh = reorder(getattr(lstm, f"weight_hh_l0{sfx}").detach().numpy())
        bi = reorder(getattr(lstm, f"bias_ih_l0{sfx}").detach().numpy())
        bh = reorder(getattr(lstm, f"bias_hh_l0{sfx}").detach().numpy())
        Ws.append(wi)
        Rs.append(wh)
        Bs.append(np.concatenate([bi, bh]))
    return (np.stack(Ws).astype(np.float32), np.stack(Rs).astype(np.float32),
            np.stack(Bs).astype(np.float32))


@pytest.mark.parametrize("bidir", [False, True])
def test_lstm_matches_torch(tmp_path, bidir):
    torch = pytest.importorskip("torch")
    T, B, I, H = 7, 2, 5, 4
    lstm = torch.nn.LSTM(I, H, bidirectional=bidir)
    W, R, Bias = _torch_lstm_to_onnx_weights(lstm, H)
    r = build(tmp_path, [ob.node(
        "LSTM", ["x", "W", "R", "B"], ["Y", "Yh", "Yc"], hidden_size=H,
        direction="bidirectional" if bidir else "forward")],
        [("x", F32, [T, B, I])], [("Y", F32, None), ("Yh", F32, None), ("Yc", F32, None)],
        {"W": W, "R": R, "B": Bias})
    x = np.random.default_rng(5).standard_normal((T, B, I)).astype(np.float32)
    out = r(x=x)
    ty, (th, tc) = lstm(torch.from_numpy(x))
    D = 2 if bidir else 1
    want_y = ty.detach().numpy().reshape(T, B, D, H).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out["Y"]), want_y, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["Yh"]), th.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["Yc"]), tc.detach().numpy(), atol=1e-5)


def test_gru_matches_torch(tmp_path):
    torch = pytest.importorskip("torch")
    T, B, I, H = 6, 3, 4, 5
    gru = torch.nn.GRU(I, H)

    def reorder(m):  # torch r,z,n → ONNX z,r,h
        r_, z, n = np.split(m, 3, axis=0)
        return np.concatenate([z, r_, n], axis=0)

    W = reorder(gru.weight_ih_l0.detach().numpy())[None].astype(np.float32)
    R = reorder(gru.weight_hh_l0.detach().numpy())[None].astype(np.float32)
    Bias = np.concatenate([reorder(gru.bias_ih_l0.detach().numpy()),
                           reorder(gru.bias_hh_l0.detach().numpy())])[None].astype(np.float32)
    r = build(tmp_path, [ob.node("GRU", ["x", "W", "R", "B"], ["Y", "Yh"],
                                 hidden_size=H, linear_before_reset=1)],
              [("x", F32, [T, B, I])], [("Y", F32, None), ("Yh", F32, None)],
              {"W": W, "R": R, "B": Bias})
    x = np.random.default_rng(6).standard_normal((T, B, I)).astype(np.float32)
    out = r(x=x)
    ty, th = gru(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out["Y"])[:, 0], ty.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["Yh"]), th.detach().numpy(), atol=1e-5)


def test_dynamic_quant_matmul_chain(tmp_path):
    """The ort quantize_dynamic pattern: DynamicQuantizeLinear → MatMulInteger
    → Cast → Mul(scales). Must approximate the float matmul."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    w_scale = np.float32(np.abs(w).max() / 127.0)
    w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
    r = build(tmp_path, [
        ob.node("DynamicQuantizeLinear", ["x"], ["xq", "xs", "xzp"]),
        ob.node("MatMulInteger", ["xq", "wq", "xzp", "wzp"], ["yi"]),
        ob.node("Cast", ["yi"], ["yf"], to=1),
        ob.node("Mul", ["xs", "ws"], ["sc"]),
        ob.node("Mul", ["yf", "sc"], ["y"]),
    ], [("x", F32, [3, 16])], [("y", F32, None)],
        {"wq": w_q, "ws": w_scale, "wzp": np.int8(0)})
    got = np.asarray(r(x=x)["y"])
    want = x @ (w_q.astype(np.float32) * w_scale)
    # error budget: activation quantization only (weights already quantized)
    np.testing.assert_allclose(got, want, atol=np.abs(x).max() / 255 * 16 * 4)


def test_matmulinteger_zero_point_decomposition_exact():
    """MatMulInteger lowers to an s8×s8→s32 MXU dot plus rank-1 zero-point
    corrections (onnx_exec._mmi). Integer arithmetic must stay BIT-exact
    vs the widened int64 reference across every zero-point layout ORT
    emits: scalar/None, per-column b, per-row a, u8 and s8 activations,
    and batched a."""
    from crispy_tpu.models.onnx_exec import _mmi

    class _N:
        attrs = {}

    def ref(a, b, azp, bzp):
        az = np.asarray(azp).astype(np.int64) if azp is not None else np.int64(0)
        if az.ndim >= 1:
            az = az[..., :, None]
        bz = np.asarray(bzp).astype(np.int64) if bzp is not None else np.int64(0)
        return (a.astype(np.int64) - az) @ (b.astype(np.int64) - bz)

    rng = np.random.default_rng(0)
    a_u8 = rng.integers(0, 256, (5, 37), np.uint8)
    a_s8 = rng.integers(-128, 128, (5, 37), np.int8)
    a_3d = rng.integers(0, 256, (2, 5, 37), np.uint8)
    b = rng.integers(-128, 128, (37, 11), np.int8)
    cases = [
        (a_u8, b, np.uint8(7), np.int8(0)),
        (a_u8, b, np.uint8(131), np.int8(-3)),
        (a_u8, b, None, None),
        (a_u8, b, np.uint8(9), rng.integers(-8, 8, 11, np.int8)),   # per-col
        (a_u8, b, rng.integers(0, 200, 5, np.uint8), np.int8(1)),   # per-row
        (a_3d, b, np.uint8(100), np.int8(2)),                       # batched
        (a_s8, b, np.int8(-5), np.int8(4)),                         # signed a
    ]
    for i, (aa, bb, az, bz) in enumerate(cases):
        got = np.asarray(_mmi(_N(), aa, bb, az, bz)).astype(np.int64)
        assert np.array_equal(got, ref(aa, bb, az, bz)), f"case {i}"


def test_big_params_stay_out_of_the_trace(tmp_path):
    """Weight-class initializers (>= BIG_PARAM_BYTES) must reach compiled
    programs as ARGUMENTS, not HLO constants: embedding them bakes the
    whole weight blob into every lowering (and, on a remote-compiler
    backend, into the compile payload — measured >25 min for a 575 MB
    bundle vs ~90 s lifted). Small initializers must stay host-concrete
    for the static partial evaluator."""
    import jax
    import jax.numpy as jnp

    from crispy_tpu.models.onnx_exec import OnnxRunner

    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 128)).astype(np.float32)  # 64 KB: big
    shp = np.array([2, 64, 128], np.int64)                  # tiny: stays
    p = tmp_path / "m.onnx"
    ob.write_model(
        p,
        [ob.node("MatMul", ["x", "w"], ["mm"]),
         ob.node("Reshape", ["mm", "shp"], ["y"])],
        [("x", 1, [2, 64, 128])], [("y", 1, [2, 64, 128])],
        {"w": w, "shp": shp})
    r = OnnxRunner.load(p).validate()
    assert set(r.big_params()) == {"w"}

    x = rng.standard_normal((2, 64, 128)).astype(np.float32)
    f_const = jax.jit(lambda a: r(x=a)["y"])
    big = r.lift_big_params()
    f_arg = jax.jit(lambda a, prm: r(prm, x=a)["y"])
    # identical numerics either way
    np.testing.assert_allclose(np.asarray(f_const(x)),
                               np.asarray(f_arg(x, big)), rtol=1e-6)
    # and the lifted lowering must NOT inline the 64 KB of weights
    t_const = f_const.lower(x).as_text()
    t_arg = f_arg.lower(x, big).as_text()
    assert len(t_arg) < len(t_const) / 3, (len(t_arg), len(t_const))


def test_slice_pad_where_reduce(tmp_path):
    rng = np.random.default_rng(8)
    x = rng.standard_normal((4, 10)).astype(np.float32)
    r = build(tmp_path, [
        ob.node("Slice", ["x", "st", "en", "ax", "sp"], ["sl"]),
        ob.node("Pad", ["sl", "pads"], ["pd"]),
        ob.node("ReduceMean", ["pd", "rax"], ["rm"], keepdims=0),
        ob.node("Greater", ["rm", "zero"], ["gt"]),
        ob.node("Where", ["gt", "rm", "zero"], ["y"]),
    ], [("x", F32, [4, 10])], [("y", F32, None)],
        {"st": np.array([2], np.int64), "en": np.array([9], np.int64),
         "ax": np.array([1], np.int64), "sp": np.array([2], np.int64),
         "pads": np.array([0, 1, 0, 1], np.int64),
         "rax": np.array([1], np.int64), "zero": np.float32(0.0)})
    got = np.asarray(r(x=x)["y"])
    sl = x[:, 2:9:2]
    pd = np.pad(sl, [(0, 0), (1, 1)])
    rm = pd.mean(axis=1)
    want = np.where(rm > 0, rm, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_reversed_slice_sentinels(tmp_path):
    """step -1 with INT64_MIN end (the ONNX 'to the beginning' sentinel)."""
    x = np.arange(24, dtype=np.float32).reshape(4, 6)
    r = build(tmp_path, [ob.node("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
              [("x", F32, [4, 6])], [("y", F32, None)],
              {"st": np.array([2 ** 63 - 1], np.int64),
               "en": np.array([-2 ** 63], np.int64),
               "ax": np.array([1], np.int64), "sp": np.array([-1], np.int64)})
    got = np.asarray(r(x=x)["y"])
    np.testing.assert_array_equal(got, x[:, ::-1])


def test_trig_mod_trilu_gathernd(tmp_path):
    rng = np.random.default_rng(9)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    r = build(tmp_path, [
        ob.node("Sin", ["x"], ["s"]),
        ob.node("Cos", ["x"], ["c"]),
        ob.node("Sign", ["x"], ["sg"]),
        ob.node("Mod", ["x", "two"], ["m"], fmod=1),
        ob.node("Trilu", ["x"], ["tu"], upper=1),
        ob.node("GatherND", ["x", "idx"], ["gn"]),
    ], [("x", F32, [3, 4])],
        [("s", F32, None), ("c", F32, None), ("sg", F32, None),
         ("m", F32, None), ("tu", F32, None), ("gn", F32, None)],
        {"two": np.float32(2.0),
         "idx": np.array([[0, 1], [2, 3]], np.int64)})
    out = r(x=x)
    np.testing.assert_allclose(np.asarray(out["s"]), np.sin(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["c"]), np.cos(x), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["sg"]), np.sign(x))
    np.testing.assert_allclose(np.asarray(out["m"]), np.fmod(x, 2.0), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["tu"]), np.triu(x))
    np.testing.assert_array_equal(np.asarray(out["gn"]), x[[0, 2], [1, 3]])


def test_unsupported_op_raises_clearly(tmp_path):
    r = build(tmp_path, [ob.node("SomeCustomOp", ["x"], ["y"])],
              [("x", F32, [1])], [("y", F32, [1])])
    with pytest.raises(NotImplementedError, match="SomeCustomOp"):
        r(x=np.zeros(1, np.float32))


def test_flatten_negative_axis(tmp_path):
    """ONNX spec: Flatten(axis=-1) on [2,3,4] → (6,4) (negative axes count
    from the end — review fix)."""
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    for axis, want in ((-1, (6, 4)), (0, (1, 24)), (2, (6, 4)), (1, (2, 12))):
        r = build(tmp_path, [ob.node("Flatten", ["x"], ["y"], axis=axis)],
                  [("x", F32, [2, 3, 4])], [("y", F32, None)],
                  name=f"f{axis}.onnx")
        got = np.asarray(r(x=x)["y"])
        assert got.shape == want, (axis, got.shape)
        np.testing.assert_array_equal(got.reshape(-1), x.reshape(-1))


def test_topk_smallest(tmp_path):
    x = np.array([[5.0, 1.0, 3.0, 2.0, 4.0]], np.float32)
    r = build(tmp_path, [ob.node("TopK", ["x", "k"], ["v", "i"], largest=0)],
              [("x", F32, [1, 5])], [("v", F32, None), ("i", 7, None)],
              {"k": np.array([2], np.int64)})
    out = r(x=x)
    np.testing.assert_array_equal(np.asarray(out["v"]), [[1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(out["i"]), [[1, 3]])
    r2 = build(tmp_path, [ob.node("TopK", ["x", "k"], ["v", "i"], largest=1)],
               [("x", F32, [1, 5])], [("v", F32, None), ("i", 7, None)],
               {"k": np.array([2], np.int64)}, name="t2.onnx")
    np.testing.assert_array_equal(np.asarray(r2(x=x)["v"]), [[5.0, 4.0]])


def test_split_uneven_num_outputs(tmp_path):
    """Opset-18 Split with num_outputs on a non-divisible axis: last chunk
    smaller ([4,4,2] for length 10), not a crash."""
    x = np.arange(10, dtype=np.float32)[None, :]
    r = build(tmp_path,
              [ob.node("Split", ["x"], ["a", "b", "c"], axis=1, num_outputs=3)],
              [("x", F32, [1, 10])],
              [("a", F32, None), ("b", F32, None), ("c", F32, None)])
    out = r(x=x)
    assert np.asarray(out["a"]).shape == (1, 4)
    assert np.asarray(out["b"]).shape == (1, 4)
    assert np.asarray(out["c"]).shape == (1, 2)
    np.testing.assert_array_equal(np.asarray(out["c"])[0], [8.0, 9.0])


def test_gathernd_negative_indices(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    idx = np.array([[-1, -1], [0, 0]], np.int64)  # last elem, first elem
    r = build(tmp_path, [ob.node("GatherND", ["d", "i"], ["y"])],
              [("d", F32, [3, 4]), ("i", 7, [2, 2])], [("y", F32, None)])
    got = np.asarray(r(d=data, i=idx)["y"])
    np.testing.assert_array_equal(got, [11.0, 0.0])


def test_convtranspose_output_shape_attr(tmp_path):
    """tf2onnx-style ConvTranspose with output_shape instead of pads must
    produce exactly the requested spatial size (torch cross-check)."""
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 7)).astype(np.float32)
    w = rng.standard_normal((2, 3, 4)).astype(np.float32)  # [Cin, Cout, k]
    # stride 2, want output length exactly 14 (SAME-style)
    r = build(tmp_path,
              [ob.node("ConvTranspose", ["x", "w"], ["y"], strides=[2],
                       kernel_shape=[4], output_shape=[14])],
              [("x", F32, [1, 2, 7])], [("y", F32, None)], {"w": w})
    got = np.asarray(r(x=x)["y"])
    assert got.shape == (1, 3, 14)
    # torch oracle: total_padding = 2*(7-1)+((4-1)+1)-14 = 2 → pads (1,1)
    want = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lstm_layout1_initial_states(tmp_path):
    """layout=1 swaps X AND the initial states ([B, D, H] per spec) —
    self-consistency vs layout=0 with pre-swapped states (review fix)."""
    torch = pytest.importorskip("torch")
    T, B, I, H = 5, 3, 4, 4
    lstm = torch.nn.LSTM(I, H)
    W, R, Bias = _torch_lstm_to_onnx_weights(lstm, H)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    h0 = rng.standard_normal((1, B, H)).astype(np.float32)  # [D, B, H]
    c0 = rng.standard_normal((1, B, H)).astype(np.float32)

    r0 = build(tmp_path, [ob.node(
        "LSTM", ["x", "W", "R", "B", "", "h0", "c0"], ["Y", "Yh", "Yc"],
        hidden_size=H)],
        [("x", F32, [T, B, I]), ("h0", F32, [1, B, H]), ("c0", F32, [1, B, H])],
        [("Y", F32, None), ("Yh", F32, None), ("Yc", F32, None)],
        {"W": W, "R": R, "B": Bias}, name="l0.onnx")
    out0 = r0(x=x, h0=h0, c0=c0)

    r1 = build(tmp_path, [ob.node(
        "LSTM", ["x", "W", "R", "B", "", "h0", "c0"], ["Y", "Yh", "Yc"],
        hidden_size=H, layout=1)],
        [("x", F32, [B, T, I]), ("h0", F32, [B, 1, H]), ("c0", F32, [B, 1, H])],
        [("Y", F32, None), ("Yh", F32, None), ("Yc", F32, None)],
        {"W": W, "R": R, "B": Bias}, name="l1.onnx")
    out1 = r1(x=x.swapaxes(0, 1), h0=h0.swapaxes(0, 1), c0=c0.swapaxes(0, 1))

    np.testing.assert_allclose(np.asarray(out1["Yh"]),
                               np.asarray(out0["Yh"]).swapaxes(0, 1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["Yc"]),
                               np.asarray(out0["Yc"]).swapaxes(0, 1), atol=1e-6)
    # torch oracle with the same states
    ty, (th, tc) = lstm(torch.from_numpy(x),
                        (torch.from_numpy(h0), torch.from_numpy(c0)))
    np.testing.assert_allclose(np.asarray(out0["Yh"]), th.detach().numpy(),
                               atol=1e-5)
