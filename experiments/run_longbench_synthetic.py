"""Accuracy-vs-CR on a REAL score: synthetic long-context retrieval QA.

The reference's north star is LongBench-score-vs-compression-rate curves on
Llama-3.1-8B (reference experiments/run_longbench.py:63-83 and
experiments/out-8b/longbench_score_by_cr.jpg). This environment has zero
egress - no pretrained checkpoint and no LongBench data can be downloaded -
so this script constructs the whole evaluation from scratch, STATED AS A
SYNTHETIC STAND-IN, while exercising the exact same pipeline:

1. TASK: key-value retrieval QA in LongBench JSONL format. A context of
   N "the code of <name> is <value> ." facts followed by "what is the code
   of <name> ?" - answerable only by reading the context, with N-1 facts
   redundant: precisely the regime KV-Compress targets (evict the KVs the
   query never attends to).
2. TOKENIZER: a WordLevel HF tokenizer over the task vocabulary, saved as
   tokenizer.json (AutoTokenizer-loadable).
3. MODEL: a 4-layer llama-architecture decoder TRAINED on the task with
   this repo's own generic decoder forward, then exported as an HF llama
   safetensors checkpoint (the inverse of models/registry.py
   _load_llama_style) so the serving stack loads it like any real model.
4. EVAL: experiments/run_longbench.py at several compression rates ->
   experiments/eval.py qa_f1 -> results_longbench_synthetic.json with the
   score-vs-CR curve.

Training runs on whatever backend JAX exposes (the TPU tunnel trains it in
minutes; CPU works with KVC_STANDIN_SMALL=1 smoke settings).

Usage: python experiments/run_longbench_synthetic.py
       [--steps N] [--skip-train] [--ckpt DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NAMES = 256
N_VALUES = 512
WORDS = ["the", "code", "of", "is", "what", "?", ".", "Answer:"]
# small: CPU smoke; medium: trainable on this image's single CPU core in
# a few hours; full: the TPU-chip configuration
SIZE = os.environ.get(
    "KVC_STANDIN_SIZE", "small" if os.environ.get(
        "KVC_STANDIN_SMALL") == "1" else "full")
SMALL = SIZE == "small"

# eval/train geometry: facts are 8 tokens each ("the code of <n> is <v> .")
FACT_LEN = 8
N_FACTS_EVAL = {"small": 24, "medium": 40, "full": 192}[SIZE]
PAD_T = {"small": 256, "medium": 384, "full": 1664}[SIZE]


def build_vocab():
    toks = ["<pad>", "<unk>", "<s>", "</s>"] + WORDS
    toks += [f"name{i:03d}" for i in range(N_NAMES)]
    toks += [f"val{i:03d}" for i in range(N_VALUES)]
    return {t: i for i, t in enumerate(toks)}


def save_tokenizer(vocab, outdir):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=t, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<pad>")
    fast.save_pretrained(outdir)
    return fast


def model_config(vocab_size):
    from kvcompress_tpu.config import ModelConfig
    L = {"small": 2, "medium": 2, "full": 4}[SIZE]
    return ModelConfig(
        num_layers=L, num_heads=8, num_kv_heads=4,
        head_size=32, hidden_size=256, intermediate_size=512,
        vocab_size=vocab_size, max_model_len=PAD_T + 64,
        rope_theta=10000.0, tie_word_embeddings=False, dtype="float32")


def make_row(rng, vocab, n_facts):
    """One LongBench-format row + its token ids (context question answer)."""
    names = rng.choice(N_NAMES, size=n_facts, replace=False)
    vals = rng.integers(0, N_VALUES, size=n_facts)
    q = int(rng.integers(0, n_facts))
    facts = [f"the code of name{n:03d} is val{v:03d} ."
             for n, v in zip(names, vals)]
    row = {
        # cloze question: the answer is the direct induction continuation
        # of the "name is" bigram seen in the context (the mechanism the
        # copy curriculum trains); a "what is ...?" phrasing needs an
        # extra retrieval hop tiny CPU-trainable models fail to learn
        "context": " ".join(facts),
        "input": f"the code of name{names[q]:03d} is",
        "answers": [f"val{vals[q]:03d}"],
        "length": n_facts * FACT_LEN + 6,
    }
    return row


def row_to_train_ids(row, vocab, pad_t):
    """Tokens of the FULL prompt as run_longbench.py renders it
    ('{context}\\n\\n{input}\\n\\nAnswer:') + the answer + </s>; loss
    weights cover the answer and the eos."""
    # no BOS: run_longbench.py tokenizes with tok.encode(), and the fast
    # WordLevel tokenizer has no bos post-processor - train and serve must
    # see identical position-0 tokens
    text = f"{row['context']} {row['input']} Answer:"
    ids = [vocab[w] for w in text.split()]
    ans = [vocab[row["answers"][0]], vocab["</s>"]]
    full = ids + ans
    toks = np.zeros((pad_t,), np.int64)
    w = np.zeros((pad_t,), np.float32)
    toks[:len(full)] = full
    # loss on the answer only - matching the trained-copier recipe that
    # provably converges (loss on the repeated segment, nothing else)
    w[len(ids):len(full)] = 1.0
    return toks, w


def train(cfg, vocab, steps, batch_size, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from kvcompress_tpu.models import decoder as D

    params = D.init_params(cfg, seed=seed, dtype=jnp.float32)

    def causal_attn(_, q, k, v, cache):
        T, H, d = q.shape
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            jnp.repeat(k, H // k.shape[1], axis=1
                                       ).astype(jnp.float32)) * d ** -0.5
        mask = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(mask[None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        vv = jnp.repeat(v, H // v.shape[1], axis=1)
        out = jnp.einsum("hqk,khd->qhd", probs, vv.astype(jnp.float32))
        return out.astype(q.dtype), cache

    def fwd_one(params, tokens):
        T = tokens.shape[0]
        xs = jnp.zeros((cfg.num_layers, 1), jnp.int32)
        hidden, _ = D.forward(params, cfg, tokens,
                              jnp.arange(T, dtype=jnp.int32), None,
                              causal_attn, xs)
        return D.compute_logits(params, cfg, hidden)

    def loss_fn(params, tokens, weights):
        logits = jax.vmap(lambda t: fwd_one(params, t))(tokens)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        w = weights[:, 1:]
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    opt = optax.adamw(optax.cosine_decay_schedule(3e-3, steps), b2=0.98)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens, weights):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, weights)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def probe_logits(params, tokens):
        return jax.vmap(lambda t: fwd_one(params, t))(tokens)

    def copy_sample(rng, pad_t):
        """Curriculum booster: facts followed by a verbatim repeat of a
        random contiguous run, loss on the repeat. Dense induction-head
        signal (the mechanism retrieval reuses); the pure one-token
        retrieval loss is too sparse to ignite the circuit at CPU-sized
        batches - mirroring the trained-copier recipe that provably
        converges (experiments/run_digit_cr_sweep.py)."""
        n = int(rng.integers(6, max(N_FACTS_EVAL // 2, 8)))
        row = make_row(rng, vocab, n)
        ids = [vocab[w] for w in row["context"].split()]
        run = int(rng.integers(2, 4))
        start = int(rng.integers(0, n - run + 1)) * FACT_LEN
        rep = ids[start:start + run * FACT_LEN]
        full = ids + rep
        toks = np.zeros((pad_t,), np.int64)
        w = np.zeros((pad_t,), np.float32)
        toks[:len(full)] = full
        w[len(ids):len(full)] = 1.0
        return toks, w

    rng = np.random.default_rng(seed)
    lo, hi = (4, N_FACTS_EVAL) if SMALL else (24, N_FACTS_EVAL)
    # fixed probe set: teacher-forced answer-token accuracy
    prng = np.random.default_rng(999)
    ptoks = np.zeros((16, PAD_T), np.int64)
    ppos = np.zeros((16,), np.int64)
    pans = np.zeros((16,), np.int64)
    for b in range(16):
        row = make_row(prng, vocab, hi)
        t, w = row_to_train_ids(row, vocab, PAD_T)
        ptoks[b] = t
        ppos[b] = np.nonzero(w)[0][0] - 1   # position that predicts answer
        pans[b] = vocab[row["answers"][0]]
    ptoks_j = jnp.asarray(ptoks)

    t0 = time.time()
    for i in range(steps):
        toks = np.zeros((batch_size, PAD_T), np.int64)
        ws = np.zeros((batch_size, PAD_T), np.float32)
        for b in range(batch_size):
            if rng.random() < 0.5:
                toks[b], ws[b] = copy_sample(rng, PAD_T)
            else:
                n = int(rng.integers(lo, hi + 1))
                toks[b], ws[b] = row_to_train_ids(
                    make_row(rng, vocab, n), vocab, PAD_T)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(toks), jnp.asarray(ws))
        if i % 250 == 0 or i == steps - 1:
            lg = np.asarray(probe_logits(params, ptoks_j))
            pred = lg[np.arange(16), ppos].argmax(-1)
            acc = float((pred == pans).mean())
            print(f"  step {i}: loss {float(loss):.4f} "
                  f"probe_acc {acc:.2f} ({time.time() - t0:.0f}s)",
                  flush=True)
    return params


def export_hf_llama(cfg, params, outdir):
    """Inverse of models/registry.py _load_llama_style: our stacked
    [L, in, out] params -> per-layer HF llama [out, in] safetensors +
    config.json."""
    from safetensors.numpy import save_file
    os.makedirs(outdir, exist_ok=True)
    lw = params["layers"]
    sd = {}
    m = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
         "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
         "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
         "w_down": "mlp.down_proj"}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        for ours, theirs in m.items():
            sd[p + theirs + ".weight"] = np.asarray(
                lw[ours][i], np.float32).T.copy()
        sd[p + "input_layernorm.weight"] = np.asarray(
            lw["input_norm"][i], np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.asarray(
            lw["post_attn_norm"][i], np.float32)
    sd["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    sd["model.norm.weight"] = np.asarray(params["final_norm"], np.float32)
    # our layout keeps embed AND lm_head in the HF [V, D] orientation
    # (registry.py _load_llama_style `put` without transpose)
    sd["lm_head.weight"] = np.asarray(params["lm_head"], np.float32)
    save_file(sd, os.path.join(outdir, "model.safetensors"))
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_size,
        "vocab_size": cfg.vocab_size,
        "max_position_embeddings": cfg.max_model_len,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "hidden_act": "silu",
        "tie_word_embeddings": False,
        "torch_dtype": "float32",
        "bos_token_id": 2, "eos_token_id": 3,
    }
    with open(os.path.join(outdir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default={
        "small": 300, "medium": 2500, "full": 4000}[SIZE])
    p.add_argument("--batch-size", type=int, default={
        "small": 8, "medium": 24, "full": 8}[SIZE])
    p.add_argument("--ckpt", default="/tmp/kvc_longbench_standin")
    p.add_argument("--skip-train", action="store_true",
                   help="reuse an existing --ckpt")
    p.add_argument("--rows", type=int, default={
        "small": 12, "medium": 36, "full": 48}[SIZE])
    p.add_argument("--crs", type=float, nargs="+",
                   default=[0.0, 2.0, 4.0, 8.0] if SIZE == "full"
                   else [0.0, 1.5, 2.0, 2.5])
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "results_longbench_synthetic.json"))
    p.add_argument("--backend", default="auto", choices=["auto", "cpu"],
                   help="cpu pins the JAX CPU backend in-process (setting "
                        "JAX_PLATFORMS in the environment instead trips "
                        "the axon sitecustomize's blocking registration)")
    args = p.parse_args(argv)

    os.environ.setdefault("KVC_COMPILATION_CACHE", "/tmp/kvc_standin_cache")
    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    vocab = build_vocab()
    cfg = model_config(len(vocab))

    if not args.skip_train:
        import jax
        print(f"training on {jax.devices()[0].platform} "
              f"(steps={args.steps}, T={PAD_T})...")
        params = train(cfg, vocab, args.steps, args.batch_size)
        print("exporting HF llama checkpoint...")
        export_hf_llama(cfg, params, args.ckpt)
        save_tokenizer(vocab, args.ckpt)
        # reload parity: exported checkpoint must reproduce the trained
        # params bit-exactly through the real loader
        from kvcompress_tpu.models.weights import load_model
        import jax.numpy as jnp
        cfg2, params2 = load_model(args.ckpt, dtype=jnp.float32)
        a = np.asarray(params["layers"]["wq"])
        b = np.asarray(params2["layers"]["wq"])
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
        print("reload parity OK")

    # ---- dataset ------------------------------------------------------
    data_dir = os.path.join(args.ckpt, "data")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(123)
    rows = [make_row(rng, vocab, N_FACTS_EVAL) for _ in range(args.rows)]
    with open(os.path.join(data_dir, "kv_retrieval.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    # ---- sweep CRs through the real runner + scorer -------------------
    import run_longbench
    import eval as lb_eval
    curve = []
    for cr in args.crs:
        out_dir = os.path.join(args.ckpt, f"preds_cr{cr:g}")
        run_longbench.main([
            "--model", args.ckpt, "--data-dir", data_dir,
            "--datasets", "kv_retrieval", "--out-dir", out_dir,
            "--compression-rate", str(cr),
            "--protected-window-size", "32",
            "--max-model-len", str(PAD_T + 64),
            "--num-blocks", "0" if not SMALL else "2048",
        ])
        preds = [json.loads(l) for l in
                 open(os.path.join(out_dir, "kv_retrieval.jsonl"))]
        score = float(np.mean([lb_eval.qa_f1(p["pred"], p["answers"])
                               for p in preds]))
        curve.append({"compression_rate": cr if cr > 0 else "off",
                      "qa_f1": round(score, 4)})
        print(f"cr={cr}: qa_f1={score:.4f}", flush=True)

    payload = {
        "dataset": ("kv_retrieval (SYNTHETIC stand-in, LongBench jsonl "
                    "format; no real checkpoint reachable offline)"),
        "model": (f"{cfg.num_layers}L/{cfg.num_heads}H llama-arch decoder "
                  f"trained on the task, served from an exported HF "
                  f"checkpoint"),
        "n_facts": N_FACTS_EVAL,
        "rows_per_point": args.rows,
        "reference": "experiments/run_longbench.py:63-83 + out-8b curves",
        "curve": curve,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
