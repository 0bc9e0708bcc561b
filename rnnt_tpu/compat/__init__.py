"""Interop with the reference PyTorch implementation (jakepoz/rnnt).

`torch_import` transplants weights from the reference's torch modules (or a
raw checkpoint ``state_dict``) into this framework's JAX pytrees, so that

* reference-trained checkpoints can be migrated onto TPU, and
* numerical parity with the reference is a *theorem* checked in CI
  (tests/test_reference_parity.py) instead of a docstring claim.
"""

from rnnt_tpu.compat.torch_import import (  # noqa: F401
    import_causal_conv,
    import_conv_predictor,
    import_encoder,
    import_joint,
    import_lstm_predictor,
    import_reference_state_dict,
)
