"""End-to-end speculative serving: distill a draft, then serve with it.

The missing piece of benchmarks/serve_bench.py --spec-gamma: a random-init
draft accepts at chance level, so the speedup there is a projection. This
script closes the loop ON CHIP: distill a shallow draft against the
(frozen) flagship over the same token distribution the serving prompts are
drawn from, measure the REAL acceptance rate and REAL tokens/sec, and
compare against the plain engine.

Run: python benchmarks/spec_serving_e2e.py [--distill-steps 400]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--draft-layers", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--sync-lag", type=int, default=2)
    ap.add_argument("--decode-block", type=int, default=0,
                    help="spec rounds per device dispatch (blocked "
                         "speculation)")
    ap.add_argument("--pretrain-steps", type=int, default=400)
    ap.add_argument("--distill-steps", type=int, default=400)
    ap.add_argument("--distill-batch", type=int, default=8)
    ap.add_argument("--distill-seq", type=int, default=256)
    ap.add_argument("--target-cache", default="checkpoints/spec_e2e_target.npz",
                    help="save/load the pretrained target here (skips the "
                         "pretrain phase when present)")
    ap.add_argument("--draft-cache", default="checkpoints/spec_e2e_draft.npz",
                    help="save/load the distilled draft here (skips the "
                         "distill phase when present)")
    ap.add_argument("--kv8", action="store_true",
                    help="serve both engines with an int8 KV cache "
                         "(kv_cache_dtype='int8')")
    ap.add_argument("--no-async-drain", action="store_true",
                    help="disable the async-drain reader (ServeConfig."
                         "async_drain defaults True since round 5) for "
                         "both engines")
    ap.add_argument("--w8", action="store_true",
                    help="serve with weight-only int8 target+draft params "
                         "(decode and the multi-token verify are weight-"
                         "read-bound, so W8 should speed both)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from kosmosx_tpu.core.config import MagnetoConfig
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.generate import SamplingConfig
    from kosmosx_tpu.nn import decoder as dec
    from kosmosx_tpu.serve import ServeConfig, ServeEngine
    from kosmosx_tpu.train.distill import make_distill_step

    cfg = MagnetoConfig(embed_dim=args.dim, ffn_dim=4 * args.dim,
                        layers=args.layers, heads=args.dim // 64,
                        max_positions=8194, compute_dtype="bfloat16",
                        scan_layers=True, dropout=0.0, attention_dropout=0.0)
    dcfg = dataclasses.replace(cfg, layers=args.draft_layers)
    params = init_casted(lambda k: dec.init_decoder(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)

    # -- briefly pretrain the target so its next-token distribution is
    # peaked (a RANDOM 32k-vocab decoder is near-uniform, so greedy argmax
    # agreement — and hence speculation — is unlearnable against it; real
    # speculation targets are trained models)
    from kosmosx_tpu.train.data import synthetic_text_batches
    from kosmosx_tpu.train.loss import next_token_loss

    # adafactor (factored second moment, no first moment) + remat +
    # donated state: full AdamW on the 2.9B flagship would need ~26 GiB on
    # a 16 GiB chip
    t_opt = optax.adafactor(learning_rate=1e-3)
    tcfg = dataclasses.replace(cfg, remat=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pretrain_step(state, toks):
        def loss_fn(p):
            logits = dec.decoder_forward(p, toks, tcfg)
            return next_token_loss(logits, toks)[0]
        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = t_opt.update(grads, state["opt_state"],
                                          state["params"])
        return {"params": optax.apply_updates(state["params"], updates),
                "opt_state": opt_state}, loss

    flat_paths = [".".join(str(getattr(p, "key", p)) for p in path)
                  for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    # caches live in the repo's checkpoints/ (gitignored), not /tmp:
    # round 3's record became unreproducible when /tmp was wiped
    for c in (args.target_cache, args.draft_cache):
        if c and os.path.dirname(c):
            os.makedirs(os.path.dirname(c), exist_ok=True)
    if args.target_cache and os.path.exists(args.target_cache):
        loaded = np.load(args.target_cache)
        leaves = [jnp.asarray(loaded[k]).astype(l.dtype) for k, l in
                  zip(flat_paths, jax.tree_util.tree_leaves(params))]
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params), leaves)
        print(f"# loaded pretrained target from {args.target_cache}",
              file=sys.stderr)
    else:
        data = synthetic_text_batches(batch_size=args.distill_batch,
                                      seq_len=args.distill_seq,
                                      vocab_size=cfg.vocab_size, seed=11)
        t_state = {"params": params, "opt_state": t_opt.init(params)}
        t0 = time.perf_counter()
        for i in range(args.pretrain_steps):
            batch = next(data)
            t_state, loss = pretrain_step(t_state,
                                          jnp.asarray(batch["input_ids"]))
            if (i + 1) % 100 == 0:
                print(f"# pretrain step {i + 1}: loss {float(loss):.4f} "
                      f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
        params = t_state["params"]
        del t_state
        if args.target_cache:
            np.savez(args.target_cache,
                     **{k: np.asarray(jax.device_get(v), np.float32)
                        for k, v in zip(flat_paths,
                                        jax.tree_util.tree_leaves(params))})

    # -- distill the draft against the frozen flagship -----------------------
    # batches drawn from the SAME distribution as the pretraining data and
    # the serving prompts, so the acceptance below is in-distribution
    # bf16 distillation at 1e-3 diverged (NaN around step 700); clip + 5e-4
    draft0 = init_casted(lambda k: dec.init_decoder(k, dcfg),
                         jax.random.PRNGKey(7), cfg.dtype)
    dflat_paths = [".".join(str(getattr(p, "key", p)) for p in path)
                   for path, _ in
                   jax.tree_util.tree_flatten_with_path(draft0)[0]]
    if args.draft_cache and os.path.exists(args.draft_cache):
        loaded = np.load(args.draft_cache)
        leaves = [jnp.asarray(loaded[k]).astype(l.dtype) for k, l in
                  zip(dflat_paths, jax.tree_util.tree_leaves(draft0))]
        draft = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(draft0), leaves)
        agree = float(loaded["__teacher_agreement__"]) \
            if "__teacher_agreement__" in loaded else -1.0
        distill_s = 0.0
        print(f"# loaded distilled draft from {args.draft_cache}",
              file=sys.stderr)
    else:
        opt = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adamw(5e-4, weight_decay=0.0))
        state = {"params": draft0, "opt_state": opt.init(draft0)}
        step = make_distill_step(dcfg, cfg, opt, temperature=1.0)
        mask = jnp.ones((args.distill_batch, args.distill_seq), jnp.float32)
        t0 = time.perf_counter()
        agree = 0.0
        ddata = synthetic_text_batches(batch_size=args.distill_batch,
                                       seq_len=args.distill_seq,
                                       vocab_size=cfg.vocab_size, seed=23)
        for i in range(args.distill_steps):
            toks = jnp.asarray(next(ddata)["input_ids"])
            state, metrics = step(state, params, toks, mask)
            if (i + 1) % 100 == 0:
                agree = float(metrics["teacher_agreement"])
                print(f"# distill step {i + 1}: loss "
                      f"{float(metrics['distill_loss']):.4f} "
                      f"agreement {agree:.3f} "
                      f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
        draft = state["params"]
        distill_s = time.perf_counter() - t0
        if args.draft_cache:
            np.savez(args.draft_cache,
                     __teacher_agreement__=np.float32(agree),
                     **{k: np.asarray(jax.device_get(v), np.float32)
                        for k, v in zip(dflat_paths,
                                        jax.tree_util.tree_leaves(draft))})

    # -- serve with the distilled draft --------------------------------------
    rng = np.random.RandomState(1)

    scfg = dataclasses.replace(
        cfg, kv_cache_dtype="int8" if args.kv8 else None)
    sdcfg = dataclasses.replace(
        dcfg, kv_cache_dtype="int8" if args.kv8 else None)
    if args.w8:
        from kosmosx_tpu.utils.quantize import quantize_params_w8
        params = jax.jit(quantize_params_w8)(params)
        draft = jax.jit(quantize_params_w8)(draft)

    def run_engine(spec: bool):
        window = ServeConfig(sync_lag=args.sync_lag,
                             spec_gamma=args.gamma if spec else 0,
                             async_drain=not args.no_async_drain,
                             decode_block=args.decode_block if spec else 0
                             ).overrun_window
        eng = ServeEngine(
            params, scfg,
            ServeConfig(max_batch=args.slots,
                        max_prompt_len=args.prompt_len,
                        max_len=args.prompt_len + args.new_tokens + window,
                        sync_lag=args.sync_lag,
                        async_drain=not args.no_async_drain,
                        decode_block=args.decode_block if spec else 0,
                        spec_gamma=args.gamma if spec else 0),
            SamplingConfig(greedy=True),
            draft_params=draft if spec else None,
            draft_cfg=sdcfg if spec else None)
        # deploy-style warmup: compiles batch-1 AND batched-admission
        # prefills (target and, for spec engines, draft) plus the step
        # programs — a mid-run compile of the batched draft prefill was
        # measured collapsing the spec phase to 63 tok/s
        eng.warmup()
        # prompts from the training distribution (prefixes of synthetic
        # sequences), so the serving-time acceptance is in-distribution
        pdata = synthetic_text_batches(batch_size=1,
                                       seq_len=args.prompt_len,
                                       vocab_size=cfg.vocab_size, seed=57)
        prompts = [next(pdata)["input_ids"][0].astype(np.int32)
                   for _ in range(args.requests)]
        handles = [eng.submit(p, max_new_tokens=args.new_tokens)
                   for p in prompts[:args.slots]]
        rest = prompts[args.slots:]
        eng.step()  # compile + first round
        t0 = time.perf_counter()
        steps = 1
        while True:
            alive = eng.step()
            steps += 1
            while rest and eng.num_active < args.slots:
                handles.append(eng.submit(rest.pop(),
                                          max_new_tokens=args.new_tokens))
                # the just-admitted request still needs decode steps: without
                # this, same-length batches complete in lockstep and the loop
                # breaks on the stale ``alive`` right after the final
                # admission, silently dropping those requests' tokens
                alive = True
            if not alive and not rest:
                break
        dt = time.perf_counter() - t0
        total = sum(len(h.tokens) for h in handles)
        acc = eng.accepted_total / max(eng.emitted_total, 1)
        return total, dt, steps, acc

    total_p, dt_p, steps_p, _ = run_engine(spec=False)
    total_s, dt_s, steps_s, acc = run_engine(spec=True)
    tps_plain = total_p / dt_p
    tps_spec = total_s / dt_s
    print(f"# plain:  {total_p} tok in {dt_p:.2f}s = {tps_plain:.0f} tok/s",
          file=sys.stderr)
    print(f"# spec:   {total_s} tok in {dt_s:.2f}s = {tps_spec:.0f} tok/s "
          f"(acceptance/token {acc:.3f}, {steps_s} rounds)", file=sys.stderr)
    print(json.dumps({
        "metric": f"DISTILLED speculative serving tokens/sec "
                  f"({args.layers}L target + {args.draft_layers}L distilled "
                  f"draft, gamma={args.gamma}, {args.slots} slots, bf16"
                  f"{', kv8' if args.kv8 else ''}"
                  f"{', w8' if args.w8 else ''}"
                  f"{f', block={args.decode_block}' if args.decode_block else ''})",
        "value": round(tps_spec, 1),
        "unit": "tokens/sec/chip",
        "vs_plain_engine": round(tps_spec / tps_plain, 3),
        "acceptance_per_token": round(acc, 4),
        "teacher_agreement_after_distill": round(agree, 4),
        "distill_seconds": round(distill_s, 1),
    }))


if __name__ == "__main__":
    main()
