from .engine import InferenceEngine, run_inference
from .export import ServingDecoder, export_decoder, load_decoder
