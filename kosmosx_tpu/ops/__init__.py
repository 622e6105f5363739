from kosmosx_tpu.ops.flash_attention import flash_attention, mha_reference
