from uurg_tpu.ops.flash_attention import attention, fused_attention
