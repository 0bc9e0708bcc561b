from rnnt_tpu.data.tokenizer import UnigramTokenizer
