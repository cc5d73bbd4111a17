"""Contract-first ONNX input binding (VERDICT r2 #1).

The exact published contracts (istupakov/onnx-asr + NeMo, FunASR
SenseVoice, GigaAM, HF-optimum) must bind by name with provenance
'exact'; substring heuristics are fallback only; an int input matching
neither must resolve to role None so engines raise instead of
zero-filling. Plus the offline op-inventory audit: the executor's op
registry must cover the op lists the real exports are built from.
"""

import numpy as np

from crispy_tpu.engine.onnx_contracts import (
    classify_inputs, input_role)

F32, I32, I64, BOOL = 1, 6, 7, 9


# ---------------------------------------------------------------------------
# Exact contracts
# ---------------------------------------------------------------------------

def test_exact_contract_names_bind_exactly():
    cases = {
        # NeMo / istupakov encoder + decoder_joint
        ("audio_signal", F32): "feats",
        ("length", I64): "length",
        ("targets", I32): "targets",
        ("target_length", I32): "target_length",
        ("encoder_outputs", F32): "enc",
        ("input_states_1", F32): "state",
        ("input_states_2", F32): "state",
        # GigaAM
        ("features", F32): "feats",
        ("feature_lengths", I64): "length",
        # FunASR SenseVoice
        ("speech", F32): "feats",
        ("speech_lengths", I32): "length",
        ("language", I32): "language",
        ("textnorm", I32): "textnorm",
        # HF optimum
        ("input_ids", I64): "tokens",
        ("decoder_input_ids", I64): "tokens",
        ("encoder_hidden_states", F32): "enc",
        ("input_features", F32): "feats",
        ("use_cache_branch", BOOL): "use_cache",
        ("past_key_values.0.decoder.key", F32): "state",
        ("past_key_values.11.encoder.value", F32): "state",
    }
    for (name, et), want in cases.items():
        role, prov = input_role(name, et)
        assert role == want, (name, role, want)
        assert prov == "exact", (name, prov)


def test_heuristic_fallback_and_loud_unknowns():
    # heuristics only fire for names outside the contract tables
    assert input_role("valid_lens", I32) == ("length", "heuristic")
    assert input_role("my_token_ids", I64) == ("tokens", "heuristic")
    assert input_role("cache_0", F32) == ("state", "heuristic")
    # an unclassifiable int input gets role None → engines must raise
    role, prov = input_role("mystery_int", I32)
    assert role is None and prov == "none"


def test_classify_orders_exact_feats_first():
    class FakeRunner:
        def input_info(self):
            return [("some_projection", F32, [None, 4]),
                    ("audio_signal", F32, [None, 80, None]),
                    ("length", I64, [None])]

    cls = classify_inputs(FakeRunner())
    assert cls["float"][0][0] == "audio_signal"  # exact contract wins
    assert [n for n, *_ in cls["int"]] == ["length"]
    assert cls["roles"]["audio_signal"] == "feats"


# ---------------------------------------------------------------------------
# Op-inventory audit (offline half of real-artifact readiness)
# ---------------------------------------------------------------------------

# Op sets the real exports are built from, pinned from the public export
# pipelines: NeMo conformer/transducer ONNX exports (Parakeet/Canary/
# GigaAM), FunASR SenseVoice, HF-optimum seq2seq decoders (merged
# use_cache_branch If graphs), UsefulSensors Moonshine, and the int8
# dynamic-quant pattern (DynamicQuantizeLinear + MatMulInteger) transcribe-rs
# runs. If a future executor refactor drops one of these, this fails before
# a real artifact ever does.
FAMILY_OPS = {
    "nemo_conformer": {
        "Conv", "MatMul", "Add", "Mul", "Div", "Sub", "Sigmoid", "Relu",
        "Tanh", "Softmax", "LogSoftmax", "Transpose", "Reshape", "Gather",
        "Concat", "Split", "Slice", "Squeeze", "Unsqueeze", "Cast", "Shape",
        "ConstantOfShape", "Expand", "Range", "Where", "ReduceMean", "Pow",
        "Sqrt", "Erf", "LayerNormalization", "Pad", "Equal", "Greater",
        "Less", "Not", "Sin", "Cos", "Identity", "Constant", "Clip",
        "GatherElements", "Tile", "Neg", "Exp", "Log", "Abs",
        "BatchNormalization", "AveragePool", "MaxPool", "Gemm",
    },
    "nemo_transducer_decoder": {"LSTM", "Gather", "MatMul", "Add", "Relu",
                                "Concat", "Squeeze", "Unsqueeze", "Transpose"},
    "funasr_sensevoice": {
        "Conv", "MatMul", "Add", "Mul", "Softmax", "LogSoftmax", "Relu",
        "Sigmoid", "Transpose", "Reshape", "Gather", "Concat", "Slice",
        "Cast", "ReduceMean", "Sqrt", "Pow", "Sub", "Div", "Expand",
        "Unsqueeze", "Squeeze", "Range", "Where", "Equal",
    },
    "optimum_seq2seq": {
        "MatMul", "Add", "Mul", "Div", "Sub", "Softmax", "Gather", "Concat",
        "Transpose", "Reshape", "Cast", "Shape", "ConstantOfShape", "Range",
        "Unsqueeze", "Squeeze", "Where", "Expand", "Equal", "Less",
        "LayerNormalization", "Erf", "Gelu", "Sqrt", "Pow", "ReduceMean",
        "Slice", "Conv", "Identity", "Constant",
    },
    "int8_dynamic_quant": {"DynamicQuantizeLinear", "MatMulInteger",
                           "DequantizeLinear", "QuantizeLinear", "ConvInteger",
                           "Mul", "Cast", "Add"},
    "wespeaker_campplus": {
        "Conv", "BatchNormalization", "Relu", "MatMul", "Add", "Concat",
        "ReduceMean", "Transpose", "Reshape", "Gemm", "AveragePool",
        "Sigmoid", "Mul", "Softmax", "GlobalAveragePool", "Flatten",
    },
    "pyannote_segmentation": {
        "Conv", "InstanceNormalization", "LeakyRelu", "MaxPool", "LSTM",
        "MatMul", "Add", "Transpose", "Reshape", "LogSoftmax", "Sigmoid",
    },
    # Ops the torch exporter itself emits for constructs common in speech
    # models — read from the INSTALLED exporter source (not memory), all
    # under torch/onnx/_internal/torchscript_exporter/:
    #   symbolic_opset10.py:471       F.interpolate            → Resize
    #   symbolic_opset9.py:4943       torch.nonzero            → NonZero
    #   symbolic_opset11.py:402,      Tensor.scatter_/index_put→ ScatterElements/
    #     symbolic_opset16.py:104,179                            ScatterND (+reduction)
    #   symbolic_opset13.py:213,692   dynamic split/unbind     → Loop
    #   symbolic_opset13.py:746       attention masks (triu)   → EyeLike
    #   symbolic_opset14.py:204       F.scaled_dot_product_attention NaN
    #                                 guard                    → IsNaN + Where
    #   symbolic_opset10.py:731       torch.isinf              → IsInf
    #   symbolic_opset11.py:336       F.pixel_shuffle          → DepthToSpace(CRD)
    #   symbolic_opset11.py:1245      F.normalize / lp_pool    → ReduceL1
    #   symbolic_opset12.py:264       F.celu                   → Celu
    #   symbolic_opset9.py:4245,4249  thresholded_relu/softsign→ ThresholdedRelu/Softsign
    "torch_exporter_long_tail": {
        "Resize", "NonZero", "ScatterElements", "ScatterND", "Loop",
        "EyeLike", "IsNaN", "IsInf", "Where", "DepthToSpace", "ReduceL1",
        "Celu", "ThresholdedRelu", "Softsign", "CumSum", "Trilu", "Xor",
    },
}


def test_executor_covers_real_export_op_inventories():
    from crispy_tpu.models.onnx_exec import _OPS

    from crispy_tpu.models.onnx_exec import SUBGRAPH_OPS

    supported = set(_OPS) | SUBGRAPH_OPS  # If/Loop/Scan: interpreter-handled
    for family, ops in FAMILY_OPS.items():
        missing = sorted(ops - supported)
        assert not missing, f"{family}: executor missing ops {missing}"


def test_engines_raise_on_unbindable_decoder_int(tmp_path):
    """A TDT decoder_joint with an unclassifiable int input must refuse to
    load (loud) rather than feed ones/zeros silently."""
    import onnx_builder as ob
    import pytest

    from crispy_tpu.engine.onnx_engines import OnnxTdtEngine
    from test_onnx_engines import make_parakeet_bundle, write_vocab

    d = make_parakeet_bundle(tmp_path)
    # rewrite the decoder_joint with a mystery int input added
    V, D, H = 10, 8, 6
    rng = np.random.default_rng(0)
    emb = (rng.standard_normal((V + 1 + 5, H)) * 0.5).astype(np.float32)
    (d / "decoder_joint-model.int8.onnx").unlink()
    ob.write_model(d / "decoder_joint-model.int8.onnx", [
        ob.node("Gather", ["emb", "targets"], ["te"], axis=0),
        ob.node("ReduceSum", ["te", "ax1"], ["outputs"], keepdims=0),
    ], [("encoder_outputs", F32, [None, D, 1]),
        ("targets", I32, [None, 1]),
        ("mystery_knob", I32, [None]),
        ("input_states_1", F32, [1, None, H])],
        [("outputs", F32, [None, V + 6]),
         ("output_states_1", F32, [1, None, H])],
        {"emb": emb, "ax1": np.array([1], np.int64)})
    with pytest.raises(ValueError, match="mystery_knob"):
        OnnxTdtEngine(d, "tdt-mystery")
