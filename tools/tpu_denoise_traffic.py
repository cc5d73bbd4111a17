"""Per-op HBM-traffic breakdown of the compiled denoise block.

The roofline (tools/mfu_report.py, docs/PERF.md) shows the S=128/F=100
block step memory-bound at ~67-71% of HBM bandwidth with ~6.8 GB of
analytic traffic per call. This tool answers "which ops move the bytes"
so traffic-reduction work (NEXT_STEPS round-6 candidate #2) is aimed by
measurement, not guesses.

Method: walk the ENTRY computation of the optimized HLO only — ops inside
fusion bodies are VMEM/register-resident and move no HBM bytes — and
charge each top-level op its operand bytes + result bytes (a name→shape
table built from every definition line resolves operand shapes). That is
the HBM traffic the op can cause, modulo XLA's buffer reuse.

Usage:  python tools/tpu_denoise_traffic.py [S] [F]
"""

import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from crispy_tpu.dsp.rnnoise import jax_pipeline as jp  # noqa: E402


_SHAPE_RE = re.compile(
    r"(f32|f64|bf16|f16|s32|s16|s8|u8|u32|pred|c64)\[([\d,]*)\]")
_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "s16": 2,
          "s8": 1, "u8": 1, "u32": 4, "pred": 1, "c64": 8}
_DEF_RE = re.compile(r"^\s*(%[\w.-]+|ROOT %[\w.-]+) = (\(?[\w\[\],{}():/ ]+?\)?) (\w+)\(")
_OPERAND_RE = re.compile(r"%[\w.-]+")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    params = jp.make_params()
    state = jp.init_state(S)
    block = jnp.zeros((S, F * jp.FRAME), jnp.float32)
    compiled = jax.jit(jp.denoise_block, donate_argnums=(1,)).lower(
        params, state, block).compile()
    hlo = compiled.as_text()

    # Pass 1: name -> result shape text, from every definition line.
    shapes = {}
    for line in hlo.splitlines():
        m = _DEF_RE.match(line)
        if m:
            name = m.group(1).replace("ROOT ", "")
            shapes[name] = m.group(2)

    # Pass 2: entry computation only.
    rows = []
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = _DEF_RE.match(line)
        if not m:
            continue
        name = m.group(1).replace("ROOT ", "")
        out_shape, op = m.group(2), m.group(3)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "after-all", "copy-start", "copy-done"):
            continue
        # operands: %refs inside the call parens, before metadata/calls
        body = line.split(f"{op}(", 1)[1]
        body = body.split(", metadata=")[0].split(", kind=")[0]
        b = shape_bytes(out_shape)
        for ref in _OPERAND_RE.findall(body):
            if ref in shapes:
                b += shape_bytes(shapes[ref])
        src = ""
        sm = re.search(r'op_name="([^"]*)"', line)
        if sm:
            src = sm.group(1)[-70:]
        lm = re.search(r'source_file="[^"]*/(\w+\.py)" source_line=(\d+)', line)
        if lm:
            src += f" @{lm.group(1)}:{lm.group(2)}"
        rows.append((b, op, name, src))

    rows.sort(reverse=True)
    agg = defaultdict(int)
    for b, op, _, _ in rows:
        agg[op] += b
    total = sum(agg.values())
    print(f"denoise_block S={S} F={F}: ENTRY-computation ops, "
          f"operand+result bytes (≈ HBM traffic ceiling per op)")
    print("\n== by op kind ==")
    for op, b in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {op:24s} {b/1e6:9.1f} MB  {100*b/total:5.1f}%")
    print(f"  {'TOTAL':24s} {total/1e6:9.1f} MB")
    print("\n== top 45 individual ops ==")
    for b, op, name, src in rows[:45]:
        print(f"  {b/1e6:8.1f} MB  {op:14s} {name:28s} {src}")

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("\n== XLA cost analysis ==")
    for k in ("flops", "bytes accessed"):
        if k in ca:
            print(f"  {k}: {ca[k]:.3e}")


if __name__ == "__main__":
    main()
