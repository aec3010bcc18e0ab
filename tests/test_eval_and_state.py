"""Caption metrics and full-train-state checkpoint round-trips."""
import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.eval.metrics import cider_d, corpus_bleu


def test_bleu_perfect_and_disjoint():
    refs = [[["a", "cat", "sat", "on", "the", "mat"]],
            [["dogs", "run", "fast", "through", "fields"]]]
    cands = [r[0] for r in refs]
    assert abs(corpus_bleu(cands, refs) - 1.0) < 1e-9
    assert corpus_bleu([["x", "y", "z", "w", "v"]] * 2, refs) == 0.0


def test_bleu_brevity_penalty():
    ref = [["a", "b", "c", "d", "e", "f", "g", "h"]]
    short = ["a", "b", "c", "d", "e"]  # perfect prefix, short
    bleu = corpus_bleu([short], [ref])
    # precisions are 1.0; score == brevity penalty exp(1 - 8/5)
    assert abs(bleu - np.exp(1 - 8 / 5)) < 1e-9


def test_bleu_clipping():
    # candidate repeats a reference unigram beyond its reference count
    refs = [[["the", "cat"]]]
    cand = [["the", "the", "the"]]
    # no higher-order overlap → BLEU-4 is 0 (n>=2 precision empty)
    assert corpus_bleu(cand, refs) == 0.0
    # unigram-only: clipped min(3,1)/3; candidate longer than ref → BP = 1
    assert abs(corpus_bleu(cand, refs, max_n=1) - 1 / 3) < 1e-9


def test_cider_orders_similarity():
    # a small corpus so IDF is informative (single-image corpora have
    # log(N)=0 and all-zero tf-idf by construction)
    corpus_refs = [
        [["a", "man", "rides", "a", "horse"],
         ["a", "person", "riding", "a", "horse"]],
        [["a", "dog", "runs", "on", "grass"],
         ["a", "puppy", "running", "outside"]],
        [["two", "children", "play", "soccer"],
         ["kids", "playing", "football"]],
    ]
    other = [["a", "dog", "runs", "on", "grass"],
             ["two", "children", "play", "soccer"]]
    good = ["a", "man", "rides", "a", "horse"]
    bad = ["blue", "quantum", "tensor", "field", "theory"]
    s_good = cider_d([good] + other, corpus_refs)
    s_bad = cider_d([bad] + other, corpus_refs)
    assert s_good > s_bad >= 0.0


def test_train_state_roundtrip(tmp_path):
    from image2text_tpu.configs.trainer import (OptimizerConfig,
                                                TrainerWrapperConfig,
                                                TrainingConfig)
    from image2text_tpu.training.loop import Trainer
    from image2text_tpu.training.wrapper import (ModelTrainerWrapper,
                                                 TokenizerInfo)
    from image2text_tpu.utils.tree import flatten
    from test_vision_encoder_decoder import tiny_config

    cfg_model = tiny_config()
    config = TrainingConfig(
        model=cfg_model, batch_size=8, epochs=1, num_steps=2, num_val_steps=1,
        tokenizer_str="synthetic", trainer=TrainerWrapperConfig(),
        optimizers=[OptimizerConfig(lr=1e-3)], dataset="synthetic",
        use_snr_optim=True)
    tok = TokenizerInfo(0, 1, 2, vocab_size=1024)
    wrapper = ModelTrainerWrapper(cfg_model, tok, config.trainer)
    params = wrapper.init(jax.random.PRNGKey(0))
    trainer = Trainer(config, wrapper, params)

    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.standard_normal((8, 3, 64, 64)), jnp.float32)
    lb = jnp.asarray(np.where(rng.random((8, 24)) < 0.7,
                              rng.integers(2, 1000, (8, 24)), -100))
    from image2text_tpu.parallel.mesh import shard_batch
    ims, lbs = shard_batch(trainer.mesh, im, lb)
    trainer.state, _ = trainer._train_step(trainer.state, ims, lbs, trainer.rng)

    path = str(tmp_path / "state")
    trainer.save_state(path)
    # materialise NOW: the next donated train step deletes these buffers
    before = {k: np.asarray(v) for k, v in flatten(trainer.state.params).items()}
    step_before = int(trainer.state.step)

    # perturb, then restore
    trainer.state, _ = trainer._train_step(trainer.state, ims, lbs, trainer.rng)
    trainer.restore_state(path)
    after = flatten(trainer.state.params)
    assert int(trainer.state.step) == step_before
    for k in before:
        np.testing.assert_array_equal(np.asarray(before[k]),
                                      np.asarray(after[k]), err_msg=k)
