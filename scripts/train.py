"""Training CLI — the working replacement for ``accelerate launch train.py``.

The reference has no CLI flags at all (static CFG class,
/root/reference/train.py:53-69 — SURVEY.md §5 config row). Every CFG field is
a flag here, plus mesh topology and model selection.

Examples:
  # text-only decoder, synthetic data, 8-way virtual mesh smoke run
  python scripts/train.py --model language --synthetic --steps 50 \
      --layers 2 --dim 64 --ffn-dim 128 --heads 4 --seq-len 64 \
      --data 2 --fsdp 2 --tensor 2

  # multimodal Kosmos on real TPU devices
  python scripts/train.py --model kosmos --synthetic --steps 1000 \
      --batch-size 8 --seq-len 2048 --optimizer lion --lr 1e-4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    # model
    p.add_argument("--model", choices=["language", "kosmos"], default="language")
    p.add_argument("--vocab-size", type=int, default=32002)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--ffn-dim", type=int, default=8192)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--max-positions", type=int, default=2048)
    p.add_argument("--no-multiway", action="store_true")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="replace the dense FFN with a token-routed MoE of "
                        "this many experts (nn/moe.py); 0 = dense")
    p.add_argument("--moe-top-k", type=int, default=2)
    p.add_argument("--moe-capacity-factor", type=float, default=1.25)
    # vision tower / resampler (kosmos model; defaults = CLIP ViT-L/14)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--patch-size", type=int, default=14)
    p.add_argument("--vision-dim", type=int, default=1024)
    p.add_argument("--vision-layers", type=int, default=24)
    p.add_argument("--vision-heads", type=int, default=16)
    p.add_argument("--vision-mlp-dim", type=int, default=4096)
    p.add_argument("--freeze-vision", action="store_true",
                   help="freeze the CLIP tower (kosmos model only): no "
                        "grads, no backward activations, no optimizer "
                        "moments for it — the reference composes "
                        "pretrained encoder towers as frozen feature "
                        "extractors; reclaims ~1.5 GB on the flagship")
    p.add_argument("--resampler-depth", type=int, default=2)
    p.add_argument("--latents", type=int, default=64,
                   help="resampler latents = image embed length")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no-flash", action="store_true")
    p.add_argument("--scan-layers", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="activation checkpointing (ref train.py:84-110)")
    p.add_argument("--remat-policy", default="nothing",
                   choices=["nothing", "dots", "dots_no_batch"])
    # training (reference CFG, train.py:53-69)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--seq-len", type=int, default=8192)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.1)
    p.add_argument("--optimizer", default="lion",
                   choices=["lion", "adamw", "stable_adamw", "adamw8bit", "lion8bit"])
    p.add_argument("--schedule", default="cosine",
                   choices=["cosine", "linear", "constant"])
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--warmup-steps", type=int, default=None)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--checkpoint-every", type=int, default=1000)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--eval-every", type=int, default=0,
                   help="validation cadence in steps (0 = off)")
    p.add_argument("--eval-pretokenized", nargs="*", default=None,
                   help="held-out pretokenized token files for --eval-every")
    p.add_argument("--eval-batches", type=int, default=16,
                   help="validation batches per evaluation")
    p.add_argument("--output-dir", default="checkpoints/")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no-final-save", action="store_true",
                   help="skip the final consolidated params save to "
                        "{output-dir}/final (ref train.py:688-695)")
    # LoRA fine-tuning (train/lora.py)
    p.add_argument("--lora-rank", type=int, default=0,
                   help="train low-rank adapters instead of full params")
    p.add_argument("--lora-alpha", type=float, default=None)
    p.add_argument("--lora-targets", default="q,k,v,out,fc1,fc2",
                   help="comma-separated linear names to adapt")
    p.add_argument("--init-checkpoint", default=None,
                   help="params-only checkpoint dir to start from (a prior "
                        "run's {output-dir}/final)")
    # mesh
    p.add_argument("--data", type=int, default=-1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tensor", type=int, default=1)
    p.add_argument("--expert", type=int, default=1,
                   help="expert-parallel mesh axis size (MoE)")
    # data
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic batches (no dataset needed)")
    p.add_argument("--text-files", nargs="*", default=None,
                   help="one-doc-per-line text files")
    p.add_argument("--hf-dataset", default=None,
                   help="Hugging Face dataset name for on-the-fly tokenized "
                        "training (ref train.py:416-462, e.g. openwebtext); "
                        "needs the datasets package + network/cache")
    p.add_argument("--hf-split", default="train")
    p.add_argument("--dpo", default=None, metavar="PREFS.jsonl",
                   help="DPO preference fine-tuning from JSONL rows "
                        "{prompt, chosen, rejected} (train/dpo.py); the "
                        "frozen reference = --init-checkpoint params (or "
                        "the fresh init); --model language only")
    p.add_argument("--dpo-beta", type=float, default=0.1)
    p.add_argument("--hf-text-key", default="text")
    p.add_argument("--distributed", action="store_true",
                   help="multi-process: jax.distributed.initialize() from "
                        "env rendezvous (ref train.py:698-711); each "
                        "process streams a disjoint round-robin batch "
                        "shard contributed as its local slice of the "
                        "global batch (global batch = batch-size x "
                        "processes). Cap the run with --steps so uneven "
                        "stream tails cannot desync the processes.")
    p.add_argument("--pretokenized", nargs="*", default=None,
                   help="pretokenized token files (.bin memmap / .npy), "
                        "re-chunked to --seq-len (ref train.py:474-483)")
    p.add_argument("--token-dtype", default=None,
                   help="dtype of raw .bin token files (default: sidecar "
                        "json, else uint16)")
    p.add_argument("--dataset-dir", default=None,
                   help="on-disk image+caption dataset dir (captions.jsonl "
                        "+ image files) for --model kosmos")
    p.add_argument("--captions-file", default="captions.jsonl")
    p.add_argument("--metrics-jsonl", default=None)
    p.add_argument("--wandb", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from kosmosx_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()

    from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                         ResamplerConfig, VisionConfig)
    from kosmosx_tpu.train.data import (hf_dataset_stream,
                                        image_caption_batches,
                                        packed_text_batches,
                                        preference_jsonl_batches,
                                        pretokenized_batches,
                                        shard_stream,
                                        synthetic_multimodal_batches,
                                        synthetic_text_batches,
                                        text_file_stream)

    shard = None
    if args.distributed:
        import jax

        from kosmosx_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()
        if jax.process_count() > 1:
            shard = (jax.process_index(), jax.process_count())
    from kosmosx_tpu.train.metrics import MetricsLogger
    from kosmosx_tpu.train.trainer import (TrainConfig, Trainer,
                                           kosmos_loss_fn, lm_loss_fn)

    dcfg = MagnetoConfig(
        vocab_size=args.vocab_size, embed_dim=args.dim, layers=args.layers,
        ffn_dim=args.ffn_dim, heads=args.heads,
        max_positions=args.max_positions, multiway=not args.no_multiway,
        compute_dtype=args.dtype, use_flash_attention=not args.no_flash,
        scan_layers=args.scan_layers, remat=args.remat,
        remat_policy=args.remat_policy, moe_experts=args.moe_experts,
        moe_top_k=args.moe_top_k,
        moe_capacity_factor=args.moe_capacity_factor)
    tcfg = TrainConfig(
        batch_size=args.batch_size, grad_accum=args.grad_accum,
        seq_len=args.seq_len, seed=args.seed, learning_rate=args.lr,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        optimizer=args.optimizer, schedule=args.schedule,
        total_steps=args.steps, warmup_steps=args.warmup_steps,
        checkpoint_every=args.checkpoint_every, log_every=args.log_every,
        eval_every=args.eval_every,
        per_process_batches=shard is not None,
        prefetch=not args.dpo,
        output_dir=args.output_dir, resume=args.resume,
        final_save=not args.no_final_save,
        data=args.data, fsdp=args.fsdp, tensor=args.tensor,
        expert=args.expert,
        freeze=("clip",) if args.freeze_vision else ())

    if args.model == "language":
        from kosmosx_tpu.nn import decoder as dec

        init_fn = lambda key: dec.init_decoder(key, dcfg)
        loss_fn = lm_loss_fn(dcfg)
        if args.dpo:
            from kosmosx_tpu.data.tokenizer import KosmosTokenizer
            from kosmosx_tpu.train.dpo import dpo_loss_fn

            loss_fn = dpo_loss_fn(dcfg, beta=args.dpo_beta)
            tok = KosmosTokenizer()
            batches = preference_jsonl_batches(
                args.dpo, tok, batch_size=args.batch_size,
                length=args.seq_len, epochs=None)
        elif args.synthetic:
            batches = synthetic_text_batches(
                batch_size=args.batch_size, seq_len=args.seq_len,
                vocab_size=args.vocab_size, steps=args.steps)
        elif args.pretokenized:
            batches = pretokenized_batches(
                args.pretokenized, batch_size=args.batch_size,
                seq_len=args.seq_len, dtype=args.token_dtype)
        elif args.hf_dataset:
            from kosmosx_tpu.data.tokenizer import KosmosTokenizer

            tok = KosmosTokenizer()
            docs = hf_dataset_stream(args.hf_dataset, tok,
                                     split=args.hf_split,
                                     text_key=args.hf_text_key)
            batches = packed_text_batches(
                docs, batch_size=args.batch_size, seq_len=args.seq_len,
                eos_id=tok.eos_token_id)
        elif args.text_files:
            from kosmosx_tpu.data.tokenizer import KosmosTokenizer

            tok = KosmosTokenizer()
            docs = text_file_stream(args.text_files, tok)
            batches = packed_text_batches(
                docs, batch_size=args.batch_size, seq_len=args.seq_len,
                eos_id=tok.eos_token_id)
        else:
            raise SystemExit("need --synthetic, --pretokenized, "
                             "--hf-dataset, or --text-files")
    else:
        from kosmosx_tpu.models.kosmos import Kosmos

        vcfg = VisionConfig(
            image_size=args.image_size, patch_size=args.patch_size,
            hidden_dim=args.vision_dim, layers=args.vision_layers,
            heads=args.vision_heads, mlp_dim=args.vision_mlp_dim,
            compute_dtype=args.dtype)
        rcfg = ResamplerConfig(
            dim=args.vision_dim, depth=args.resampler_depth,
            num_latents=args.latents, num_media_embeds=vcfg.seq_len,
            compute_dtype=args.dtype)
        kcfg = KosmosConfig(decoder=dcfg, vision=vcfg, resampler=rcfg,
                            image_embed_len=args.latents)
        init_fn = lambda key: Kosmos.init(key, kcfg)
        loss_fn = kosmos_loss_fn(kcfg)
        if args.synthetic:
            batches = synthetic_multimodal_batches(
                batch_size=args.batch_size, seq_len=args.seq_len,
                vocab_size=args.vocab_size, steps=args.steps)
        elif args.dataset_dir:
            from kosmosx_tpu.data.tokenizer import KosmosTokenizer

            tok = KosmosTokenizer(image_size=args.image_size,
                                  image_embed_len=args.latents)
            batches = image_caption_batches(
                args.dataset_dir, tok, batch_size=args.batch_size,
                text_len=args.seq_len, captions_file=args.captions_file,
                epochs=None)
        else:
            raise SystemExit("kosmos training needs --synthetic or "
                             "--dataset-dir (captions.jsonl + images)")

    if shard is not None:
        # EVERY source shards at BATCH granularity (equal per-process rate;
        # synthetic streams included — identical streams would otherwise be
        # presented as disjoint local shards, duplicating data)
        batches = shard_stream(batches, *shard)

    base_params = None
    if args.init_checkpoint:
        import jax

        from kosmosx_tpu.train import checkpoint as ckpt

        abstract = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
        base_params = ckpt.restore_params(args.init_checkpoint, abstract)

    if args.lora_rank > 0:
        from kosmosx_tpu.train.lora import LoraTrainer

        trainer = LoraTrainer(
            init_fn=init_fn, loss_fn=loss_fn, cfg=tcfg, rank=args.lora_rank,
            alpha=args.lora_alpha,
            targets=tuple(t for t in args.lora_targets.split(",") if t),
            base_params=base_params)
    else:
        trainer = Trainer(init_fn=init_fn, loss_fn=loss_fn, cfg=tcfg)
        if base_params is not None:
            # warm-start full training without the throwaway random init
            trainer.init_state(initial_params=base_params)
    log_fn = MetricsLogger(jsonl_path=args.metrics_jsonl,
                           use_wandb=args.wandb,
                           config=vars(args)) if (args.metrics_jsonl or
                                                  args.wandb) else None
    if args.dpo and args.model == "language":
        # frozen reference = the trainer's STARTING params (checkpoint warm
        # start or the fresh init); its log-probs attach per batch OUTSIDE
        # the step (train/dpo.py — one cached jitted forward per config)
        import jax

        from kosmosx_tpu.train.dpo import compute_ref_logprobs

        if base_params is not None:
            ref_params = base_params
        elif args.lora_rank > 0:
            if trainer.state is None:
                trainer.init_state()
            ref_params = trainer.base_params  # frozen, never donated
        else:
            import jax.numpy as jnp

            if trainer.state is None:
                trainer.init_state()
            # the donated train step invalidates state buffers every step:
            # the frozen reference must be an independent COPY
            ref_params = jax.tree_util.tree_map(jnp.array,
                                                trainer.state["params"])
        batches = (compute_ref_logprobs(ref_params, dcfg, b)
                   for b in batches)

    eval_fn = None
    if args.eval_every and args.eval_pretokenized:
        import itertools

        def eval_fn():
            return itertools.islice(
                pretokenized_batches(args.eval_pretokenized,
                                     batch_size=args.batch_size,
                                     seq_len=args.seq_len,
                                     dtype=args.token_dtype),
                args.eval_batches)

    state, metrics = trainer.run(batches, steps=args.steps, log_fn=log_fn,
                                 eval_batches=eval_fn)
    if args.lora_rank > 0 and not args.no_final_save:
        # raw adapter factors for multi-LoRA serving
        # (ServeEngine.load_adapter / scripts/serve.py --adapter)
        from kosmosx_tpu.train import checkpoint as _ckpt

        _ckpt.save_params(state["lora"],
                          os.path.join(args.output_dir, "adapter"))
    print("final:", {k: float(v) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
