from rnnt_tpu.config.config import (
    Config,
    TrainingConfig,
    load_config,
    config_to_dict,
    save_config,
    build_model_spec,
    build_featurizer_spec,
)
