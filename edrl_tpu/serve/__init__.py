from edrl_tpu.serve.predictor import Predictor

__all__ = ["Predictor"]
