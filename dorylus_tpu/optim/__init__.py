from dorylus_tpu.optim.adam import AdamState, adam_init, adam_update, sgd_update  # noqa: F401
