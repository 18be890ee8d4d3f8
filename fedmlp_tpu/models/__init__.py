from fedmlp_tpu.models.factory import build_model, MODEL_REGISTRY, feature_dim_of

__all__ = ["build_model", "MODEL_REGISTRY", "feature_dim_of"]
