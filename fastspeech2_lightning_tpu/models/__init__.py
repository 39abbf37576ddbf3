from .fastspeech2 import FastSpeech2, FastSpeech2Output

__all__ = ["FastSpeech2", "FastSpeech2Output"]
