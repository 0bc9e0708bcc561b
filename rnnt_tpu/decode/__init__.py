from rnnt_tpu.decode.greedy import greedy_decode
