"""Executor dynamic control flow (Loop/Scan) and dynamic-shape ops
(NonZero/Resize/Scatter*) vs torch / numpy oracles.

The reference hands any export straight to ONNX Runtime
(managers/transcription.rs:119-172), which runs Loop/Scan graphs (some
NeMo/espnet decoder exports ship them). Resize semantics are pinned
against the installed torch exporter's own attribute conventions
(torch/onnx/_internal/torchscript_exporter/symbolic_helper.py:1145-1156:
nearest → asymmetric+floor, linear → half_pixel / align_corners).
"""

import numpy as np
import pytest

from crispy_tpu.models.onnx_exec import OnnxRunner

import onnx_builder as ob

F32, I64, BOOL = 1, 7, 9


def build(tmp_path, nodes, inputs, outputs, inits=None, name="m.onnx"):
    p = tmp_path / name
    ob.write_model(p, nodes, inputs, outputs, inits)
    return OnnxRunner.load(p)


class TestLoop:
    def _counter_body(self):
        """body(iter, cond, acc) -> (cond, acc + x[iter-agnostic add])."""
        return ob.graph_proto(
            [ob.node("Add", ["acc_in", "one"], ["acc_out"]),
             ob.node("Identity", ["cond_in"], ["cond_out"])],
            [("iter", I64, []), ("cond_in", BOOL, []), ("acc_in", F32, [2])],
            [("cond_out", BOOL, []), ("acc_out", F32, [2])],
            {"one": np.ones(2, np.float32)})

    def test_static_trip_count_unrolls(self, tmp_path):
        r = build(tmp_path, [
            ob.node("Loop", ["M", "cond", "acc0"], ["acc_final"],
                    body=self._counter_body()),
        ], [("acc0", F32, [2])], [("acc_final", F32, [2])],
            {"M": np.int64(5), "cond": np.array(True)})
        out = r(acc0=np.zeros(2, np.float32))
        np.testing.assert_allclose(np.asarray(out["acc_final"]), [5.0, 5.0])

    def test_static_cond_breaks_early(self, tmp_path):
        # body: acc += 1; cond_out = acc[0] < 3  (static all the way)
        body = ob.graph_proto(
            [ob.node("Add", ["acc_in", "one"], ["acc_out"]),
             ob.node("Gather", ["acc_out", "zero"], ["a0"], axis=0),
             ob.node("Less", ["a0", "three"], ["cond_out"])],
            [("iter", I64, []), ("cond_in", BOOL, []), ("acc_in", F32, [2])],
            [("cond_out", BOOL, []), ("acc_out", F32, [2])],
            {"one": np.ones(2, np.float32), "zero": np.int64(0),
             "three": np.float32(3.0)})
        r = build(tmp_path, [
            ob.node("Loop", ["M", "cond", "acc0"], ["acc_final"], body=body),
        ], [("acc0", F32, [2])], [("acc_final", F32, [2])],
            {"M": np.int64(100), "cond": np.array(True)})
        # runs eagerly (all-static inputs): stops once acc[0] reaches 3
        out = r(acc0=np.zeros(2, np.float32))
        np.testing.assert_allclose(np.asarray(out["acc_final"]), [3.0, 3.0])

    def test_scan_outputs_stack(self, tmp_path):
        # scan output: per-iteration acc snapshot -> [M, 2]
        body = ob.graph_proto(
            [ob.node("Add", ["acc_in", "one"], ["acc_out"]),
             ob.node("Identity", ["cond_in"], ["cond_out"]),
             ob.node("Identity", ["acc_out"], ["snap"])],
            [("iter", I64, []), ("cond_in", BOOL, []), ("acc_in", F32, [2])],
            [("cond_out", BOOL, []), ("acc_out", F32, [2]), ("snap", F32, [2])],
            {"one": np.ones(2, np.float32)})
        r = build(tmp_path, [
            ob.node("Loop", ["M", "cond", "acc0"], ["acc_final", "snaps"],
                    body=body),
        ], [("acc0", F32, [2])], [("acc_final", F32, [2]), ("snaps", F32, [3, 2])],
            {"M": np.int64(3), "cond": np.array(True)})
        out = r(acc0=np.zeros(2, np.float32))
        np.testing.assert_allclose(np.asarray(out["snaps"]),
                                   [[1, 1], [2, 2], [3, 3]])

    def test_traced_cond_while_loop(self, tmp_path):
        """Data-dependent condition with a traced input → lax.while_loop:
        doubles acc until acc[0] >= limit (limit is a runtime input)."""
        body = ob.graph_proto(
            [ob.node("Mul", ["acc_in", "two"], ["acc_out"]),
             ob.node("Gather", ["acc_out", "zero"], ["a0"], axis=0),
             ob.node("Less", ["a0", "limit"], ["cond_out"])],
            [("iter", I64, []), ("cond_in", BOOL, []), ("acc_in", F32, [2])],
            [("cond_out", BOOL, []), ("acc_out", F32, [2])],
            {"two": np.full(2, 2.0, np.float32), "zero": np.int64(0)})
        r = build(tmp_path, [
            ob.node("Loop", ["M", "cond", "acc0"], ["acc_final"], body=body),
        ], [("acc0", F32, [2]), ("limit", F32, [])], [("acc_final", F32, [2])],
            {"M": np.int64(64), "cond": np.array(True)})
        import jax
        import jax.numpy as jnp

        fn = jax.jit(lambda a, lim: r(acc0=a, limit=lim)["acc_final"])
        out = np.asarray(fn(jnp.ones(2, jnp.float32), jnp.float32(10.0)))
        np.testing.assert_allclose(out, [16.0, 16.0])  # 1→2→4→8→16 (≥10 stops)
        out = np.asarray(fn(jnp.ones(2, jnp.float32), jnp.float32(3.0)))
        np.testing.assert_allclose(out, [4.0, 4.0])

    def _snap_loop(self, tmp_path):
        body = ob.graph_proto(
            [ob.node("Mul", ["acc_in", "two"], ["acc_out"]),
             ob.node("Gather", ["acc_out", "zero"], ["a0"], axis=0),
             ob.node("Less", ["a0", "limit"], ["cond_out"]),
             ob.node("Identity", ["acc_out"], ["snap"])],
            [("iter", I64, []), ("cond_in", BOOL, []), ("acc_in", F32, [2])],
            [("cond_out", BOOL, []), ("acc_out", F32, [2]), ("snap", F32, [2])],
            {"two": np.full(2, 2.0, np.float32), "zero": np.int64(0)})
        return build(tmp_path, [
            ob.node("Loop", ["M", "cond", "acc0"], ["acc_final", "snaps"],
                    body=body),
        ], [("acc0", F32, [2]), ("limit", F32, [])],
            [("acc_final", F32, [2]), ("snaps", F32, [None, 2])],
            {"M": np.int64(8), "cond": np.array(True)})

    def test_traced_cond_with_scan_outputs_rejected_under_jit(self, tmp_path):
        import jax
        import jax.numpy as jnp

        r = self._snap_loop(tmp_path)
        with pytest.raises(NotImplementedError, match="scan outputs"):
            jax.jit(lambda a, lim: r(acc0=a, limit=lim)["acc_final"])(
                jnp.ones(2, jnp.float32), jnp.float32(10.0))

    def test_traced_cond_with_scan_outputs_eager(self, tmp_path):
        """Eager execution: the [M]-preallocated while_loop scan buffers are
        sliced to the realized trip count — exact ONNX Loop semantics."""
        import jax.numpy as jnp

        r = self._snap_loop(tmp_path)
        out = r(acc0=jnp.ones(2, jnp.float32), limit=jnp.float32(10.0))
        np.testing.assert_allclose(np.asarray(out["acc_final"]), [16.0, 16.0])
        np.testing.assert_allclose(  # snapshots AFTER each doubling: 2,4,8,16
            np.asarray(out["snaps"]),
            [[2.0, 2.0], [4.0, 4.0], [8.0, 8.0], [16.0, 16.0]])
        # different limit → different realized length from the same runner
        out = r(acc0=jnp.ones(2, jnp.float32), limit=jnp.float32(3.0))
        assert np.asarray(out["snaps"]).shape == (2, 2)

    def test_validate_descends_loop_body(self, tmp_path):
        body = ob.graph_proto(
            [ob.node("NoSuchOp", ["acc_in"], ["acc_out"]),
             ob.node("Identity", ["cond_in"], ["cond_out"])],
            [("iter", I64, []), ("cond_in", BOOL, []), ("acc_in", F32, [2])],
            [("cond_out", BOOL, []), ("acc_out", F32, [2])])
        r = build(tmp_path, [
            ob.node("Loop", ["M", "cond", "acc0"], ["acc_final"], body=body),
        ], [("acc0", F32, [2])], [("acc_final", F32, [2])],
            {"M": np.int64(2), "cond": np.array(True)})
        with pytest.raises(NotImplementedError, match="NoSuchOp"):
            r.validate()


class TestScan:
    def test_cumulative_sum_state_and_stack(self, tmp_path):
        """Scan over [T, 2]: carry = carry + x_t; scan output = carry."""
        body = ob.graph_proto(
            [ob.node("Add", ["s_in", "x_t"], ["s_out"]),
             ob.node("Identity", ["s_out"], ["y_t"])],
            [("s_in", F32, [2]), ("x_t", F32, [2])],
            [("s_out", F32, [2]), ("y_t", F32, [2])])
        r = build(tmp_path, [
            ob.node("Scan", ["s0", "xs"], ["s_final", "ys"],
                    body=body, num_scan_inputs=1),
        ], [("s0", F32, [2]), ("xs", F32, [4, 2])],
            [("s_final", F32, [2]), ("ys", F32, [4, 2])])
        xs = np.arange(8, dtype=np.float32).reshape(4, 2)
        out = r(s0=np.zeros(2, np.float32), xs=xs)
        np.testing.assert_allclose(np.asarray(out["s_final"]),
                                   xs.sum(axis=0))
        np.testing.assert_allclose(np.asarray(out["ys"]),
                                   np.cumsum(xs, axis=0))

    def test_reverse_direction(self, tmp_path):
        body = ob.graph_proto(
            [ob.node("Add", ["s_in", "x_t"], ["s_out"]),
             ob.node("Identity", ["s_out"], ["y_t"])],
            [("s_in", F32, [2]), ("x_t", F32, [2])],
            [("s_out", F32, [2]), ("y_t", F32, [2])])
        r = build(tmp_path, [
            ob.node("Scan", ["s0", "xs"], ["s_final", "ys"],
                    body=body, num_scan_inputs=1,
                    scan_input_directions=[1], scan_output_directions=[1]),
        ], [("s0", F32, [2]), ("xs", F32, [4, 2])],
            [("s_final", F32, [2]), ("ys", F32, [4, 2])])
        xs = np.arange(8, dtype=np.float32).reshape(4, 2)
        out = r(s0=np.zeros(2, np.float32), xs=xs)
        # reverse scan: y emitted back-to-front then re-reversed to align
        expect = np.cumsum(xs[::-1], axis=0)[::-1]
        np.testing.assert_allclose(np.asarray(out["ys"]), expect)

    def test_jittable_with_traced_input(self, tmp_path):
        body = ob.graph_proto(
            [ob.node("Add", ["s_in", "x_t"], ["s_out"]),
             ob.node("Identity", ["s_out"], ["y_t"])],
            [("s_in", F32, [2]), ("x_t", F32, [2])],
            [("s_out", F32, [2]), ("y_t", F32, [2])])
        r = build(tmp_path, [
            ob.node("Scan", ["s0", "xs"], ["s_final", "ys"],
                    body=body, num_scan_inputs=1),
        ], [("s0", F32, [2]), ("xs", F32, [8, 2])],
            [("s_final", F32, [2]), ("ys", F32, [8, 2])])
        import jax
        import jax.numpy as jnp

        xs = np.random.default_rng(0).standard_normal((8, 2)).astype(np.float32)
        fn = jax.jit(lambda s, x: r(s0=s, xs=x)["ys"])
        np.testing.assert_allclose(np.asarray(fn(jnp.zeros(2), jnp.asarray(xs))),
                                   np.cumsum(xs, axis=0), rtol=1e-6)


class TestNonZero:
    def test_static_matches_numpy(self, tmp_path):
        r = build(tmp_path, [ob.node("NonZero", ["x"], ["y"])],
                  [("x", F32, [3, 4])], [("y", I64, [2, None])],
                  {"x": np.array([[0, 1, 0, 2], [0, 0, 0, 0], [3, 0, 0, 4]],
                                 np.float32)})
        out = np.asarray(r()["y"])
        np.testing.assert_array_equal(
            out, np.stack(np.nonzero(np.array([[0, 1, 0, 2], [0, 0, 0, 0],
                                               [3, 0, 0, 4]]))))

    def test_traced_input_rejected_loudly(self, tmp_path):
        r = build(tmp_path, [ob.node("NonZero", ["x"], ["y"])],
                  [("x", F32, [3])], [("y", I64, [1, None])])
        import jax
        import jax.numpy as jnp

        with pytest.raises(NotImplementedError, match="NonZero"):
            jax.jit(lambda x: r(x=x)["y"])(jnp.ones(3))


class TestResize:
    """Pinned against torch.nn.functional.interpolate — the exporter whose
    attribute conventions the handler implements."""

    @pytest.mark.parametrize("scale", [2, 3])
    def test_nearest_matches_torch(self, tmp_path, scale):
        import torch
        import torch.nn.functional as tF

        x = np.random.default_rng(0).standard_normal((1, 2, 5, 7)).astype(np.float32)
        # torch exports nearest as asymmetric + floor (symbolic_helper.py:1150)
        r = build(tmp_path, [
            ob.node("Resize", ["x", "", "scales"], ["y"], mode="nearest",
                    coordinate_transformation_mode="asymmetric",
                    nearest_mode="floor"),
        ], [("x", F32, [1, 2, 5, 7])], [("y", F32, None)],
            {"scales": np.array([1, 1, scale, scale], np.float32)})
        out = np.asarray(r(x=x)["y"])
        ref = tF.interpolate(torch.from_numpy(x), scale_factor=scale,
                             mode="nearest").numpy()
        np.testing.assert_array_equal(out, ref)

    def test_linear_half_pixel_matches_torch(self, tmp_path):
        import torch
        import torch.nn.functional as tF

        x = np.random.default_rng(1).standard_normal((1, 3, 6, 4)).astype(np.float32)
        r = build(tmp_path, [
            ob.node("Resize", ["x", "", "", "sizes"], ["y"], mode="linear",
                    coordinate_transformation_mode="half_pixel"),
        ], [("x", F32, [1, 3, 6, 4])], [("y", F32, None)],
            {"sizes": np.array([1, 3, 12, 9], np.int64)})
        out = np.asarray(r(x=x)["y"])
        ref = tF.interpolate(torch.from_numpy(x), size=(12, 9),
                             mode="bilinear", align_corners=False).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_linear_align_corners_matches_torch(self, tmp_path):
        import torch
        import torch.nn.functional as tF

        x = np.random.default_rng(2).standard_normal((1, 1, 5, 5)).astype(np.float32)
        r = build(tmp_path, [
            ob.node("Resize", ["x", "", "", "sizes"], ["y"], mode="linear",
                    coordinate_transformation_mode="align_corners"),
        ], [("x", F32, [1, 1, 5, 5])], [("y", F32, None)],
            {"sizes": np.array([1, 1, 9, 9], np.int64)})
        out = np.asarray(r(x=x)["y"])
        ref = tF.interpolate(torch.from_numpy(x), size=(9, 9),
                             mode="bilinear", align_corners=True).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


class TestScatterOps:
    def test_scatternd_set_and_add(self, tmp_path):
        data = np.zeros((4, 3), np.float32)
        idx = np.array([[0], [2]], np.int64)
        upd = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
        r = build(tmp_path, [ob.node("ScatterND", ["d", "i", "u"], ["y"])],
                  [("d", F32, [4, 3]), ("i", I64, [2, 1]), ("u", F32, [2, 3])],
                  [("y", F32, [4, 3])])
        out = np.asarray(r(d=data, i=idx, u=upd)["y"])
        expect = data.copy()
        expect[[0, 2]] = upd
        np.testing.assert_array_equal(out, expect)
        r2 = build(tmp_path, [ob.node("ScatterND", ["d", "i", "u"], ["y"],
                                      reduction="add")],
                   [("d", F32, [4, 3]), ("i", I64, [2, 1]), ("u", F32, [2, 3])],
                   [("y", F32, [4, 3])], name="m2.onnx")
        base = np.ones((4, 3), np.float32)
        out2 = np.asarray(r2(d=base, i=idx, u=upd)["y"])
        expect2 = base.copy()
        expect2[[0, 2]] += upd
        np.testing.assert_array_equal(out2, expect2)

    def test_scatter_elements_axis1(self, tmp_path):
        data = np.zeros((2, 5), np.float32)
        idx = np.array([[1, 3], [0, 4]], np.int64)
        upd = np.array([[10, 30], [1, 40]], np.float32)
        r = build(tmp_path, [ob.node("ScatterElements", ["d", "i", "u"], ["y"],
                                     axis=1)],
                  [("d", F32, [2, 5]), ("i", I64, [2, 2]), ("u", F32, [2, 2])],
                  [("y", F32, [2, 5])])
        out = np.asarray(r(d=data, i=idx, u=upd)["y"])
        expect = data.copy()
        for b in range(2):
            for k in range(2):
                expect[b, idx[b, k]] = upd[b, k]
        np.testing.assert_array_equal(out, expect)


class TestLongTailOps:
    def test_misc_numerics(self, tmp_path):
        x = np.array([[-2.0, -0.4, 0.0, 0.6, 3.0]], np.float32)
        cases = [
            ("Softsign", {}, x / (1 + np.abs(x))),
            ("Celu", {"alpha": 0.5},
             np.maximum(x, 0) + np.minimum(0, 0.5 * (np.exp(x / 0.5) - 1))),
            ("ThresholdedRelu", {"alpha": 0.5}, np.where(x > 0.5, x, 0)),
            ("Shrink", {"lambd": 0.5, "bias": 0.1},
             np.where(x < -0.5, x + 0.1, np.where(x > 0.5, x - 0.1, 0))),
        ]
        for opname, attrs, expect in cases:
            r = build(tmp_path, [ob.node(opname, ["x"], ["y"], **attrs)],
                      [("x", F32, [1, 5])], [("y", F32, [1, 5])],
                      name=f"{opname}.onnx")
            np.testing.assert_allclose(np.asarray(r(x=x)["y"]), expect,
                                       rtol=1e-5, atol=1e-6, err_msg=opname)

    def test_mish_matches_torch(self, tmp_path):
        import torch

        x = np.linspace(-4, 4, 17, dtype=np.float32)[None]
        r = build(tmp_path, [ob.node("Mish", ["x"], ["y"])],
                  [("x", F32, [1, 17])], [("y", F32, [1, 17])])
        ref = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(r(x=x)["y"]), ref,
                                   rtol=1e-5, atol=1e-6)

    def test_lpnormalization(self, tmp_path):
        x = np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32)
        r = build(tmp_path, [ob.node("LpNormalization", ["x"], ["y"], axis=1, p=2)],
                  [("x", F32, [3, 4])], [("y", F32, [3, 4])])
        out = np.asarray(r(x=x)["y"])
        np.testing.assert_allclose(out, x / np.linalg.norm(x, axis=1, keepdims=True),
                                   rtol=1e-5)

    def test_depth_space_roundtrip(self, tmp_path):
        import torch

        x = np.random.default_rng(0).standard_normal((1, 8, 4, 6)).astype(np.float32)
        r = build(tmp_path, [ob.node("DepthToSpace", ["x"], ["y"], blocksize=2,
                                     mode="CRD")],
                  [("x", F32, [1, 8, 4, 6])], [("y", F32, None)])
        ref = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # CRD order
        np.testing.assert_array_equal(np.asarray(r(x=x)["y"]), ref)
        # SpaceToDepth emits DCR-ordered channels (ONNX spec), whose exact
        # inverse is DepthToSpace(mode=DCR) — round-trip must be identity
        r2 = build(tmp_path, [
            ob.node("SpaceToDepth", ["x"], ["y"], blocksize=2),
            ob.node("DepthToSpace", ["y"], ["z"], blocksize=2, mode="DCR"),
        ], [("x", F32, [1, 2, 4, 6])], [("y", F32, None), ("z", F32, None)],
            name="s2d.onnx")
        x2 = x[:, :2]
        out = r2(x=x2)
        assert np.asarray(out["y"]).shape == (1, 8, 2, 3)
        np.testing.assert_array_equal(np.asarray(out["z"]), x2)

    def test_reduce_variants(self, tmp_path):
        x = np.random.default_rng(0).standard_normal((2, 5)).astype(np.float32)
        for opname, expect in [
            ("ReduceL1", np.abs(x).sum(axis=1, keepdims=True)),
            ("ReduceSumSquare", (x ** 2).sum(axis=1, keepdims=True)),
            ("ReduceLogSum", np.log(np.abs(x).sum(axis=1, keepdims=True))),
        ]:
            inp = np.abs(x) if opname == "ReduceLogSum" else x
            r = build(tmp_path, [ob.node(opname, ["x"], ["y"], axes=[1])],
                      [("x", F32, [2, 5])], [("y", F32, [2, 1])],
                      name=f"{opname}.onnx")
            np.testing.assert_allclose(np.asarray(r(x=inp)["y"]), expect,
                                       rtol=1e-5, err_msg=opname)
