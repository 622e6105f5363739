from kosmosx_tpu.train.dpo import (compute_ref_logprobs, dpo_loss_fn,
                                   preference_batch, sequence_logprob)
from kosmosx_tpu.train.distill import (distill_draft, distill_loss,
                                       make_distill_step)
from kosmosx_tpu.train.loss import next_token_loss
from kosmosx_tpu.train.lora import (LoraTrainer, add_lora, attach_lora,
                                    make_lora_train_step, merge_lora,
                                    strip_lora)
from kosmosx_tpu.train.optim import (
    make_optimizer,
    make_schedule,
    stable_adamw,
)
from kosmosx_tpu.train.trainer import TrainConfig, Trainer, TrainState, make_train_step

__all__ = [
    "distill_draft", "distill_loss", "make_distill_step",
    "compute_ref_logprobs", "dpo_loss_fn", "preference_batch",
    "sequence_logprob",
    "next_token_loss",
    "LoraTrainer", "add_lora", "attach_lora", "make_lora_train_step",
    "merge_lora", "strip_lora",
    "make_optimizer", "make_schedule", "stable_adamw",
    "TrainConfig", "Trainer", "TrainState", "make_train_step",
]
