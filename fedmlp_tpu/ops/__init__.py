from fedmlp_tpu.ops import losses, similarity, augment  # noqa: F401
