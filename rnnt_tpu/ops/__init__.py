from rnnt_tpu.ops.causal_conv import (
    ConvSpec,
    causal_conv_init,
    causal_conv_apply,
    causal_conv_streaming,
    causal_conv_state_len,
    causal_conv_out_len,
    conv1x1_init,
    conv1x1_apply,
)
from rnnt_tpu.ops.norm import (
    norm_init,
    norm_apply,
    layer_norm_init,
    layer_norm_apply,
)
