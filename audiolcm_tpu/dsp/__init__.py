from audiolcm_tpu.dsp.mel import MelConfig, MelSpectrogram, mel_filterbank, stft_magnitude

__all__ = ["MelConfig", "MelSpectrogram", "mel_filterbank", "stft_magnitude"]
