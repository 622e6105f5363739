from kosmosx_tpu.ops.decode_attention import (decode_attention,
                                              decode_attention_reference)
from kosmosx_tpu.ops.flash_attention import flash_attention, mha_reference
from kosmosx_tpu.ops.quant_matmul import w8_matmul, w8_matmul_reference
