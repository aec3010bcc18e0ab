"""Serving-mode caption-quality price tags with PAIRED bootstrap error
bars (VERDICT r4 item 6: the 16-class/40-image protocol saturated BLEU at
~0.88 and its mode deltas sat inside the metric's resolution).

Runs the SAME trained checkpoint through every serving mode over the same
val images (batched generation, candidate-0 protocol, 5 references), then
bootstrap-resamples the image set to put a 95% CI on each mode's corpus
BLEU-4 / CIDEr-D *and on its paired delta vs the exact path* — the delta
distribution is what prices a mode.

    python tools/quality_price_tags.py \
        --config_file training_configs/local/synthetic-quality2.yaml \
        --chkpt_file artifacts/quality2_ck.npz --num_images 200 \
        --bootstrap 500 --out QUALITY_r05.json
"""
from __future__ import annotations

import json
import sys
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import yaml


def _strip(ids, eos):
    out = []
    for t in ids:
        if t == eos:
            break
        out.append(int(t))
    return out


def main(args):
    from image2text_tpu.configs.trainer import TrainingConfig
    from image2text_tpu.eval.metrics import cider_d, corpus_bleu
    from image2text_tpu.models.generation_utils import BeamSearchTokenGenerator
    from image2text_tpu.models.quantization import int8_serving_params
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
    from image2text_tpu.parallel.mesh import honor_platform_env
    from image2text_tpu.training.data import normalize_label
    from image2text_tpu.training.tokenizer import get_tokenizer
    from image2text_tpu.utils.compile_cache import setup_compile_cache
    from trainer import build_inner_datasets

    honor_platform_env()
    setup_compile_cache()
    with open(args.config_file) as f:
        config = TrainingConfig.model_validate(yaml.safe_load(f))
    if args.chkpt_file:
        config.model.chkpt_path = args.chkpt_file
    tokenizer = get_tokenizer(
        config.tokenizer_str, config.trainer.mask_fraction,
        synthetic_vocab=config.model.decoder_config.vocab_size,
        allow_fallback=config.dataset.startswith("synthetic"))
    model = VisionEncoderDecoder(config.model)
    params = model.init(jax.random.PRNGKey(config.seed))
    params_i8 = dict(params)
    params_i8["decoder"] = int8_serving_params(model.decoder,
                                               params["decoder"])
    eos = tokenizer.eos_token_id
    window = model.decoder.block_size - model.space_for_prompt
    max_new = min(args.max_new_tokens, window - 1)

    # ---- collect val rows --------------------------------------------------
    _, val_ds = build_inner_datasets(config, tokenizer)
    images, refs = [], []
    for batch in val_ds:
        for row in range(batch["image"].shape[0]):
            if len(images) >= args.num_images:
                break
            images.append(batch["image"][row])
            truths = []
            for c in range(5):
                lab = normalize_label(
                    batch[f"input_ids_{c}"][row:row + 1],
                    batch[f"attn_mask_{c}"][row:row + 1],
                    config.ignore_index)[0]
                truths.append(_strip(lab[lab != config.ignore_index], eos))
            refs.append(truths)
        if len(images) >= args.num_images:
            break
    n = len(images)
    images = np.stack(images)
    prompt = jnp.asarray([[tokenizer.bos_token_id]])

    # ---- batched generation per mode (shared rng stream: paired) ----------
    def gen_mode(mode):
        cands = []
        p = params_i8 if mode == "int8" else params
        ckv = "int8" if mode == "int8" else None
        if mode == "beam":
            gen = BeamSearchTokenGenerator(
                model, beam_width=4, temperature=args.temperature,
                top_k=args.top_k, max_new_tokens=max_new, eos_token_id=eos,
                no_repeat_n_grams=tuple(config.model.no_repeat_n_grams),
                consolidation_temperature=0.0)
        for s in range(0, n, args.gen_batch):
            img = jnp.asarray(images[s:s + args.gen_batch])
            rng = jax.random.PRNGKey(config.seed + 1000 + s)  # same per mode
            if mode == "beam":
                ids, _ = gen(p, img, prompt, rng=rng)
                out = np.asarray(ids[:, 0, 1:])
            else:
                out = np.asarray(model.generate(
                    p, img, prompt, max_new_tokens=max_new,
                    temperature=args.temperature, top_k=args.top_k, rng=rng,
                    cross_kv_quant=ckv,
                    approx_top_k=(mode == "approx"))[:, 1:])
            cands.extend(_strip(row, eos) for row in out)
        return cands

    modes = ["exact", "approx", "beam", "int8"]
    cands = {m: gen_mode(m) for m in modes}

    # ---- corpus metrics + paired bootstrap --------------------------------
    point = {m: {"bleu4": round(corpus_bleu(cands[m], refs), 4),
                 "cider_d": round(cider_d(cands[m], refs), 4)}
             for m in modes}
    rng = np.random.default_rng(0)
    boot = {m: {"bleu4": [], "cider_d": []} for m in modes}
    for _ in range(args.bootstrap):
        idx = rng.integers(0, n, n)
        rs = [refs[i] for i in idx]
        for m in modes:
            cs = [cands[m][i] for i in idx]
            boot[m]["bleu4"].append(corpus_bleu(cs, rs))
            boot[m]["cider_d"].append(cider_d(cs, rs))

    def ci(a):
        a = np.asarray(a)
        return [round(float(np.percentile(a, 2.5)), 4),
                round(float(np.percentile(a, 97.5)), 4)]

    rows = []
    for m in modes:
        row = {"mode": m, **point[m],
               "bleu4_ci95": ci(boot[m]["bleu4"]),
               "cider_ci95": ci(boot[m]["cider_d"])}
        if m != "exact":
            # token-level agreement with the exact path (same rng stream):
            # identical captions make the metric deltas exactly zero, and
            # this field says so directly
            same = sum(cands[m][i] == cands["exact"][i] for i in range(n))
            row["caption_exact_match_rate"] = round(same / n, 4)
        if m != "exact":
            for metric in ("bleu4", "cider_d"):
                d = (np.asarray(boot[m][metric])
                     - np.asarray(boot["exact"][metric]))
                row[f"delta_{metric}"] = round(
                    point[m][metric] - point["exact"][metric], 4)
                row[f"delta_{metric}_ci95"] = ci(d)
                row[f"delta_{metric}_significant"] = bool(
                    np.percentile(d, 2.5) > 0 or np.percentile(d, 97.5) < 0)
        rows.append(row)
    out = {
        "what": ("Serving-mode quality price tags with paired bootstrap "
                 "CIs (round-5 protocol: compositional 8x6x6 synthetic "
                 "task, multi-clause captions, candidate-0, 5 refs; "
                 "deltas vs exact share the image resamples — the "
                 "paired distribution prices the mode)"),
        "config": args.config_file, "checkpoint": args.chkpt_file,
        "num_images": n, "bootstrap_resamples": args.bootstrap,
        "temperature": args.temperature, "top_k": args.top_k,
        "max_new_tokens": max_new,
        "rows": rows,
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    p = ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--chkpt_file", default=None)
    p.add_argument("--num_images", type=int, default=200)
    p.add_argument("--gen_batch", type=int, default=64)
    p.add_argument("--bootstrap", type=int, default=500)
    p.add_argument("--max_new_tokens", type=int, default=28)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top_k", type=int, default=16)
    p.add_argument("--out", default="QUALITY_r05.json")
    main(p.parse_args(sys.argv[1:]))
