from .dsp import estoi, f0_metrics, f0_rmse, lsd, mcd, mcd_dtw, snr, stoi, yin_f0
from .dtw import dtw_distance, dtw_path
