from rnnt_tpu.models.encoder import (
    EncoderSpec,
    JasperBlockSpec,
    encoder_init,
    encoder_apply,
    encoder_out_len,
    encoder_streaming_apply,
    encoder_streaming_init_state,
)
from rnnt_tpu.models.predictor import (
    ConvPredictorSpec,
    LSTMPredictorSpec,
    predictor_init,
    predictor_apply,
)
from rnnt_tpu.models.joint import JointSpec, joint_init, joint_apply, joint_single
from rnnt_tpu.models.rnnt import RNNTSpec, rnnt_init, rnnt_loss_apply
