"""Train the committed tiny llama checkpoint (CPU, ~5 min, deterministic).

Produces tests/assets/tiny_trained_llama/ — a ~5M-param llama-geometry LM
trained on the synthetic corpus (evals/synthetic_corpus.py) to non-trivial
loss, so the accuracy gate (evals/self_consistency.py) measures quant
drift on WEIGHTS THAT COMPUTE SOMETHING instead of random init
(VERDICT r4 weak #4 / task 9). Saved in bf16 safetensors to keep the repo
small (~11 MB).

Run: python scripts/train_tiny_checkpoint.py [--steps 3000]
"""

import argparse
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sglang_custom_tpu.evals.synthetic_corpus import (  # noqa: E402
    SEQ_LEN,
    VOCAB,
    eval_sets,
    make_batch,
    transition_table,
)

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "assets", "tiny_trained_llama"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=1024,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=1024, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=0,
    )
    model = LlamaForCausalLM(cfg).to(torch.float32)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"params: {n_params/1e6:.2f}M", flush=True)

    table = transition_table()
    rng = np.random.RandomState(42)
    opt = torch.optim.AdamW(model.parameters(), lr=args.lr,
                            weight_decay=0.01)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=args.steps
    )

    model.train()
    t0 = time.time()
    for step in range(args.steps):
        ids = torch.tensor(make_batch(rng, table, args.batch, SEQ_LEN))
        out = model(input_ids=ids, labels=ids)
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        opt.zero_grad(set_to_none=True)
        if step % 200 == 0 or step == args.steps - 1:
            print(f"step {step:5d} loss {out.loss.item():.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # held-out metrics, recorded next to the checkpoint
    model.eval()
    big, cp = eval_sets(table)
    with torch.no_grad():
        def acc(rows, lo):
            ids = torch.tensor(rows)
            logits = model(input_ids=ids).logits
            pred = logits[:, :-1].argmax(-1).numpy()
            tgt = rows[:, 1:]
            return float((pred[:, lo:] == tgt[:, lo:]).mean())

        k = (SEQ_LEN - 2) // 2
        bigram_acc = acc(big, 0)
        copy_acc = acc(cp, k + 1)
    print(f"held-out bigram acc {bigram_acc:.3f}, copy acc {copy_acc:.3f}",
          flush=True)

    os.makedirs(args.out, exist_ok=True)
    model.to(torch.bfloat16).save_pretrained(
        args.out, safe_serialization=True
    )
    import json

    with open(os.path.join(args.out, "TRAINING.json"), "w") as f:
        json.dump({
            "steps": args.steps, "batch": args.batch,
            "final_loss": round(out.loss.item(), 4),
            "heldout_bigram_acc": round(bigram_acc, 4),
            "heldout_copy_acc": round(copy_acc, 4),
            "corpus": "evals/synthetic_corpus.py (seeded)",
        }, f, indent=1)
    print("saved to", args.out, flush=True)


if __name__ == "__main__":
    main()
