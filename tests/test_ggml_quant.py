"""ggml quantized-tensor dequantization (q4_0/q4_1/q5_0/q5_1/q8_0).

The reference catalog ships quantized whisper.cpp files (whisper-medium-
q4_1.bin, ggml-large-v3-q5_0.bin — managers/model.rs:100-160) that
whisper.cpp dequantizes on load. Here: scalar encoders/decoders written
independently from the public ggml block layout act as the spec; the
vectorized `dequantize_ggml` must match the scalar decoder bit-exactly,
and a synthetic quantized ggml container must load end-to-end.
"""

import struct

import numpy as np
import pytest

from crispy_tpu.models.whisper.weights import _GGML_QUANT, _QK, dequantize_ggml, load_ggml


def f16(x):
    return np.float16(x)


# --- scalar reference encoders (ggml quantize_row_* semantics) -------------

def enc_q4_0(x):
    out = bytearray()
    for blk in x.reshape(-1, 32):
        amax_i = int(np.argmax(np.abs(blk)))
        mx = blk[amax_i]
        d = mx / -8.0
        idv = 0.0 if d == 0 else 1.0 / d
        out += f16(d).tobytes()
        qs = [min(15, int(blk[j] * idv + 8.5)) for j in range(32)]
        for j in range(16):
            out.append(qs[j] | (qs[j + 16] << 4))
    return bytes(out)


def enc_q4_1(x):
    out = bytearray()
    for blk in x.reshape(-1, 32):
        mn, mx = float(blk.min()), float(blk.max())
        d = (mx - mn) / 15.0
        idv = 0.0 if d == 0 else 1.0 / d
        out += f16(d).tobytes() + f16(mn).tobytes()
        qs = [min(15, int((blk[j] - mn) * idv + 0.5)) for j in range(32)]
        for j in range(16):
            out.append(qs[j] | (qs[j + 16] << 4))
    return bytes(out)


def enc_q5_0(x):
    out = bytearray()
    for blk in x.reshape(-1, 32):
        amax_i = int(np.argmax(np.abs(blk)))
        mx = blk[amax_i]
        d = mx / -16.0
        idv = 0.0 if d == 0 else 1.0 / d
        out += f16(d).tobytes()
        qs = [min(31, int(blk[j] * idv + 16.5)) for j in range(32)]
        qh = 0
        for j in range(16):
            qh |= ((qs[j] >> 4) & 1) << j
            qh |= ((qs[j + 16] >> 4) & 1) << (j + 16)
        out += struct.pack("<I", qh)
        for j in range(16):
            out.append((qs[j] & 0x0F) | ((qs[j + 16] & 0x0F) << 4))
    return bytes(out)


def enc_q5_1(x):
    out = bytearray()
    for blk in x.reshape(-1, 32):
        mn, mx = float(blk.min()), float(blk.max())
        d = (mx - mn) / 31.0
        idv = 0.0 if d == 0 else 1.0 / d
        out += f16(d).tobytes() + f16(mn).tobytes()
        qs = [min(31, int((blk[j] - mn) * idv + 0.5)) for j in range(32)]
        qh = 0
        for j in range(16):
            qh |= ((qs[j] >> 4) & 1) << j
            qh |= ((qs[j + 16] >> 4) & 1) << (j + 16)
        out += struct.pack("<I", qh)
        for j in range(16):
            out.append((qs[j] & 0x0F) | ((qs[j + 16] & 0x0F) << 4))
    return bytes(out)


def enc_q8_0(x):
    out = bytearray()
    for blk in x.reshape(-1, 32):
        amax = float(np.abs(blk).max())
        d = amax / 127.0
        idv = 0.0 if d == 0 else 1.0 / d
        out += f16(d).tobytes()
        out += np.round(blk * idv).astype(np.int8).tobytes()
    return bytes(out)


# --- scalar reference decoders (ggml dequantize_row_* literally) -----------

def dec_scalar(data, ttype, count):
    block_bytes = _GGML_QUANT[ttype][0]
    y = np.zeros(count, np.float32)
    for i in range(count // 32):
        b = data[i * block_bytes:(i + 1) * block_bytes]
        if ttype == 2:  # q4_0
            d = np.frombuffer(b[:2], "<f2")[0].astype(np.float32)
            for j in range(16):
                y[i * 32 + j] = ((b[2 + j] & 0x0F) - 8) * d
                y[i * 32 + j + 16] = ((b[2 + j] >> 4) - 8) * d
        elif ttype == 3:  # q4_1
            d = np.frombuffer(b[:2], "<f2")[0].astype(np.float32)
            m = np.frombuffer(b[2:4], "<f2")[0].astype(np.float32)
            for j in range(16):
                y[i * 32 + j] = (b[4 + j] & 0x0F) * d + m
                y[i * 32 + j + 16] = (b[4 + j] >> 4) * d + m
        elif ttype == 6:  # q5_0
            d = np.frombuffer(b[:2], "<f2")[0].astype(np.float32)
            qh = struct.unpack("<I", b[2:6])[0]
            for j in range(16):
                xh0 = ((qh >> j) << 4) & 0x10
                xh1 = (qh >> (j + 12)) & 0x10
                y[i * 32 + j] = (((b[6 + j] & 0x0F) | xh0) - 16) * d
                y[i * 32 + j + 16] = (((b[6 + j] >> 4) | xh1) - 16) * d
        elif ttype == 7:  # q5_1
            d = np.frombuffer(b[:2], "<f2")[0].astype(np.float32)
            m = np.frombuffer(b[2:4], "<f2")[0].astype(np.float32)
            qh = struct.unpack("<I", b[4:8])[0]
            for j in range(16):
                xh0 = ((qh >> j) << 4) & 0x10
                xh1 = (qh >> (j + 12)) & 0x10
                y[i * 32 + j] = ((b[8 + j] & 0x0F) | xh0) * d + m
                y[i * 32 + j + 16] = ((b[8 + j] >> 4) | xh1) * d + m
        elif ttype == 8:  # q8_0
            d = np.frombuffer(b[:2], "<f2")[0].astype(np.float32)
            q = np.frombuffer(b[2:34], np.int8)
            y[i * 32:(i + 1) * 32] = q.astype(np.float32) * d
    return y


ENCODERS = {2: enc_q4_0, 3: enc_q4_1, 6: enc_q5_0, 7: enc_q5_1, 8: enc_q8_0}
# max round-trip error per format ≈ one quant step d (the asymmetric grids
# lose up to a full step at the clipped edge), with d set by the block range.
TOL = {2: 0.6, 3: 0.3, 6: 0.3, 7: 0.15, 8: 0.03}


@pytest.mark.parametrize("ttype", sorted(ENCODERS))
def test_vectorized_matches_scalar_decoder(ttype):
    rng = np.random.default_rng(ttype)
    x = rng.standard_normal(8 * _QK).astype(np.float32)
    data = ENCODERS[ttype](x)
    want = dec_scalar(data, ttype, x.size)
    got = dequantize_ggml(data, ttype, x.size)
    np.testing.assert_array_equal(got, want)
    # and the round trip is within quantization error
    np.testing.assert_allclose(got, x, atol=TOL[ttype])


def test_quantized_ggml_file_loads(tmp_path):
    """A synthetic ggml container with q4_1 + q5_0 + q8_0 tensors parses and
    dequantizes through load_ggml (no NotImplementedError path left)."""
    n_vocab, n_mels, d = 16, 8, 64
    path = tmp_path / "ggml-tiny-q.bin"
    rng = np.random.default_rng(0)
    tensors = {
        # (name, ggml_type): values — shapes as ggml stores them ([out, in])
        ("decoder.token_embedding.weight", 3): rng.standard_normal((n_vocab, d)).astype(np.float32),
        ("encoder.ln_post.weight", 0): np.ones(d, np.float32),
        ("encoder.ln_post.bias", 0): np.zeros(d, np.float32),
        ("decoder.blocks.0.mlp.0.weight", 6): rng.standard_normal((4 * d, d)).astype(np.float32),
        ("decoder.blocks.0.mlp.2.weight", 8): rng.standard_normal((d, 4 * d)).astype(np.float32),
    }
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 0x67676D6C))
        # quantized files carry ftype = base + 1000*qnt_version in hparams
        f.write(struct.pack("<11i", n_vocab, 4, d, 2, 1, 4, d, 2, 1, n_mels, 2003))
        f.write(struct.pack("<2i", n_mels, 5))
        f.write(np.zeros(n_mels * 5, np.float32).tobytes())
        f.write(struct.pack("<i", n_vocab))
        for i in range(n_vocab):
            tok = f"t{i}".encode()
            f.write(struct.pack("<i", len(tok)))
            f.write(tok)
        for (name, ttype), arr in tensors.items():
            dims = tuple(reversed(arr.shape))
            f.write(struct.pack("<3i", len(dims), len(name.encode()), ttype))
            f.write(struct.pack(f"<{len(dims)}i", *dims))
            f.write(name.encode())
            flat = np.ascontiguousarray(arr, np.float32).reshape(-1)
            if ttype == 0:
                f.write(flat.tobytes())
            else:
                f.write(ENCODERS[ttype](flat))

    params, cfg, vocab, _ = load_ggml(path)
    assert cfg.n_vocab == n_vocab and len(vocab) == n_vocab
    emb = tensors[("decoder.token_embedding.weight", 3)]
    np.testing.assert_allclose(params["dec.emb"], emb, atol=TOL[3])
    fc1 = tensors[("decoder.blocks.0.mlp.0.weight", 6)]
    np.testing.assert_allclose(params["dec.0.mlp.fc1.w"], fc1.T, atol=TOL[6])
    fc2 = tensors[("decoder.blocks.0.mlp.2.weight", 8)]
    np.testing.assert_allclose(params["dec.0.mlp.fc2.w"], fc2.T, atol=TOL[8])
