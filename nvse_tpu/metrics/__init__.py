from .dsp import estoi, f0_metrics, f0_rmse, lsd, mcd, snr, stoi, yin_f0
