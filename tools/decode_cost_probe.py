"""Static per-step cost attribution of the flagship decode loop.

The slope probes (tools/decode_slope.py) measure ~6.7 ms/step for the full
generate loop body at batch 256 but only ~1.2 + 1.2 ms for the isolated
decoder-step and sampling loops — leaving ~4 ms/step structurally
unattributed, and on-chip re-measures are hostage to tunnel phases.  This
probe needs NO healthy chip: it compiles the same programs at two trip
counts and diffs XLA's own cost model (flops / bytes accessed), giving the
exact per-step traffic the hardware must move, then walks the optimized
HLO while-body and ranks its ops by output bytes so the inflating op is
named rather than guessed.

Usage: python tools/decode_cost_probe.py [batch] [--backend cpu|tpu]
"""
from __future__ import annotations

import collections
import json
import re
import sys

import numpy as np

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-decode")

import jax
import jax.numpy as jnp

MAX_STEPS_LO, MAX_STEPS_HI = 8, 160

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8}

_SHAPE_RE = re.compile(r"\b(pred|s8|u8|s16|u16|bf16|f16|s32|u32|f32|s64|u64|"
                       r"f64)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Total bytes of every typed shape literal in an HLO result type."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def while_body_report(hlo: str, top: int = 25):
    """Rank the ops inside while-body computations by output bytes."""
    # computations look like:  %name (args) -> type { ... lines ... }
    comps = {}
    cur, lines = None, []
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->", line)
        if m and line.rstrip().endswith("{"):
            cur, lines = m.group(1), []
            comps[cur] = lines
            continue
        if cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                lines.append(line)
    body_names = [n for n in comps
                  if "body" in n and "cond" not in n]
    rows = []
    per_op = collections.Counter()
    for name in body_names:
        for line in comps[name]:
            m = re.match(r"\s*%?([\w.\-]+)\s*=\s*(\([^=]*\)|\S+)\s+(\w+)\(",
                         line)
            if not m:
                continue
            op_name, result_ty, opcode = m.groups()
            if opcode in ("parameter", "constant", "get-tuple-element",
                          "tuple", "bitcast"):
                continue
            b = shape_bytes(result_ty)
            per_op[opcode] += b
            rows.append((b, name, opcode, op_name, result_ty.strip()))
    rows.sort(reverse=True)
    return body_names, rows[:top], per_op


def build_programs(batch: int):
    from __graft_entry__ import _flagship_config
    from image2text_tpu.models.generation import (EVAL, _sample_step,
                                                  decoder_step,
                                                  precompute_cross_kv)
    from image2text_tpu.models.vision_encoder_decoder import \
        VisionEncoderDecoder
    from image2text_tpu.ops.preprocess import resize_normalize_on_device

    cfg = _flagship_config(tiny=False)
    model = VisionEncoderDecoder(cfg.model)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (batch, 160, 240, 3)), jnp.uint8)
    prompt = jnp.ones((batch, 1), jnp.int32)
    im_size = cfg.model.vision_encoder_config.input.width
    images = jax.jit(lambda r: resize_normalize_on_device(
        r, im_size, out_dtype=jnp.bfloat16))(raw)
    enc_out = jax.jit(lambda p, im: model.encoder(p["encoder"], im,
                                                  ctx=EVAL))(params, images)
    off = model.space_for_prompt
    total = 1 + MAX_STEPS_HI
    vocab = cfg.model.decoder_config.vocab_size

    def gen_n(n):
        return jax.jit(lambda p, im, pr, r: model.generate(
            p, im, pr, max_new_tokens=n, temperature=0.7, top_k=16, rng=r))

    def decode_loop(n, use_cross):
        def fn(p, enc_out):
            cross = enc_out if use_cross else None
            cache = model.decoder.init_cache(batch, total, enc_out.dtype)
            logits, cache = decoder_step(model, p, prompt, cache, off, cross)
            cross_kv = precompute_cross_kv(model, p, cross)

            def body(i, carry):
                cache, last = carry
                nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)[:, None]
                logits, cache = decoder_step(model, p, nxt, cache,
                                             off + 1 + i, cross,
                                             cross_kv=cross_kv)
                return cache, logits[:, -1]

            _, last = jax.lax.fori_loop(0, n, body, (cache, logits[:, -1]))
            return last

        return jax.jit(fn)

    def sample_loop(n):
        def fn(last, r):
            ids_buf = jnp.zeros((batch, total), jnp.int32)

            def body(i, carry):
                ids_buf, last, r = carry
                r, key = jax.random.split(r)
                nxt = _sample_step(model, ids_buf, 1 + i, last, key, 0.7,
                                   16, None)
                ids_buf = jax.lax.dynamic_update_slice(
                    ids_buf, nxt[:, None], (0, 1 + i))
                last = last + 1e-6 * jax.nn.one_hot(nxt, vocab)
                return ids_buf, last, r

            _, last, _ = jax.lax.fori_loop(
                0, n, body, (ids_buf, last, jax.random.PRNGKey(0)))
            return last

        return jax.jit(fn)

    last0 = jnp.asarray(rng.standard_normal((batch, vocab)), jnp.float32)
    return {
        "full": (gen_n, (params, images, prompt, jax.random.PRNGKey(0))),
        "decode": (lambda n: decode_loop(n, True), (params, enc_out)),
        "sample": (sample_loop, (last0, jax.random.PRNGKey(0))),
    }


def main(batch: int):
    progs = build_programs(batch)
    report = {"batch": batch, "backend": jax.default_backend()}
    hlo_hi = {}
    for name, (make, args) in progs.items():
        costs = {}
        for n in (MAX_STEPS_LO, MAX_STEPS_HI):
            compiled = make(n).lower(*args).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            costs[n] = ca
            if n == MAX_STEPS_HI:
                hlo_hi[name] = compiled.as_text()
        d = MAX_STEPS_HI - MAX_STEPS_LO
        lo, hi = costs[MAX_STEPS_LO], costs[MAX_STEPS_HI]
        flops = (hi.get("flops", 0) - lo.get("flops", 0)) / d
        byac = (hi.get("bytes accessed", 0) - lo.get("bytes accessed", 0)) / d
        report[name] = {
            "flops_per_step": round(flops / 1e9, 3),          # GFLOP
            "bytes_accessed_per_step_gb": round(byac / 1e9, 4),
            "hbm_ms_at_819gbs": round(byac / 819e6, 3),
            "total_bytes_hi_gb": round(hi.get("bytes accessed", 0) / 1e9, 3),
        }
        print(name, json.dumps(report[name]), flush=True)

    for name, hlo in hlo_hi.items():
        bodies, rows, per_op = while_body_report(hlo)
        print(f"\n=== {name}: while bodies {bodies}")
        print("--- per-opcode output bytes (one loop iteration):")
        for opcode, b in per_op.most_common(12):
            print(f"  {opcode:28s} {b/1e6:10.2f} MB")
        print("--- top ops by output bytes:")
        for b, body, opcode, op_name, ty in rows:
            print(f"  {b/1e6:10.2f} MB  {opcode:18s} {op_name[:60]:60s} {ty[:80]}")
    print("\n" + json.dumps(report))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(argv[0]) if argv else 256)
