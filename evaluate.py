"""Offline model evaluation (the TPU equivalent of the reference's
test-model-performance.ipynb): load a config + checkpoint, stream val rows,
generate candidate captions per image (sampling or beam search), print them
against the ground truths, and compute corpus BLEU-4 / CIDEr-D.

    python evaluate.py --config_file training_configs/local/nano-mini.yaml \
        [--chkpt_file ck.npz] [--num_images 20] [--num_candidates 8] \
        [--beam_search] [--top_k 16] [--temperature 1.0]
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from image2text_tpu.configs.trainer import TrainingConfig
from image2text_tpu.eval.metrics import cider_d, corpus_bleu
from image2text_tpu.models.generation_utils import BeamSearchTokenGenerator
from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
from image2text_tpu.training.tokenizer import get_tokenizer
from trainer import build_inner_datasets


def _strip(ids, eos):
    out = []
    for t in ids:
        if t == eos:
            break
        out.append(int(t))
    return out


def main(args):
    from image2text_tpu.parallel.mesh import honor_platform_env
    from image2text_tpu.utils.compile_cache import setup_compile_cache

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
    if args.int8_serving:
        # full int8 serving: W8A8 decoder weights; generation paths also
        # get cross_kv_quant="int8" below.  Lossy — useful for measuring
        # the serving mode's caption-quality cost on real data
        from image2text_tpu.models.quantization import int8_serving_params

        params = dict(params)
        params["decoder"] = int8_serving_params(model.decoder,
                                                params["decoder"])

    from image2text_tpu.training.data import normalize_label

    # iterate the INNER dataset (pre-expansion batch dicts) so every image
    # is scored once against ALL FIVE of its reference captions — the
    # standard Flickr30K protocol (the 5x-expanded training loader would
    # both duplicate images and supply a single lone reference each time)
    _, val_ds = build_inner_datasets(config, tokenizer)
    eos = tokenizer.eos_token_id
    prompt = jnp.asarray([[tokenizer.bos_token_id]])
    window = model.decoder.block_size - model.space_for_prompt
    max_new = min(args.max_new_tokens, window - 1)

    if args.beam_search:
        gen = BeamSearchTokenGenerator(
            model, beam_width=args.num_candidates, temperature=args.temperature,
            top_k=args.top_k, max_new_tokens=max_new, eos_token_id=eos,
            no_repeat_n_grams=tuple(config.model.no_repeat_n_grams),
            consolidation_temperature=0.0,
            cross_kv_quant="int8" if args.int8_serving else None)

    cands, refs = [], []
    rng = jax.random.PRNGKey(config.seed + 123)
    seen = 0
    for batch in val_ds:
        for row in range(batch["image"].shape[0]):
            if seen >= args.num_images:
                break
            img = jnp.asarray(batch["image"][row:row + 1])
            truths = []
            for c in range(5):
                lab = normalize_label(
                    batch[f"input_ids_{c}"][row:row + 1],
                    batch[f"attn_mask_{c}"][row:row + 1],
                    config.ignore_index)[0]
                truths.append(_strip(lab[lab != config.ignore_index], eos))
            rng, k = jax.random.split(rng)
            if args.beam_search:
                ids, scores = gen(params, img, prompt, rng=k)
                best = np.asarray(ids[0, 0, 1:])
            else:
                # num_candidates parallel samples (the reference notebook
                # prints them all); METRICS use candidate 0 only — scoring
                # best-of-N would inflate vs the standard protocol
                x = jnp.broadcast_to(img,
                                     (args.num_candidates, *img.shape[1:]))
                out = model.generate(
                    params, x, prompt, max_new_tokens=max_new,
                    temperature=args.temperature, top_k=args.top_k, rng=k,
                    cross_kv_quant="int8" if args.int8_serving else None,
                    approx_top_k=args.approx_topk)
                best = np.asarray(out[0, 1:])
            cand = _strip(best, eos)
            cands.append(cand)
            refs.append(truths)
            if seen < 5:
                print(f"[{seen}] truth: {tokenizer.decode(truths[0])}")
                print(f"[{seen}] gen:   {tokenizer.decode(cand)}")
            seen += 1
        if seen >= args.num_images:
            break

    bleu = corpus_bleu(cands, refs)
    cider = cider_d(cands, refs)
    print(f"BLEU-4: {bleu:.4f}  CIDEr-D: {cider:.4f}  "
          f"({args.num_images} images)")


def parse_args(argv=None):
    p = ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--chkpt_file", default=None)
    p.add_argument("--num_images", type=int, default=20)
    p.add_argument("--num_candidates", type=int, default=4)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=16)
    p.add_argument("--beam_search", action="store_true")
    p.add_argument("--int8_serving", action="store_true",
                   help="W8A8 decoder weights + int8 cross-KV (lossy "
                        "serving mode); measures its quality cost")
    p.add_argument("--approx_topk", action="store_true",
                   help="ApproxTopK sampling head pull (recall 0.95, "
                        "sampled paths only); measures its quality cost")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))
