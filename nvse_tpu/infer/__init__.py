from .engine import InferenceEngine, run_inference
