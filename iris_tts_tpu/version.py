"""Version of the iris_tts_tpu framework."""

__version__ = "0.1.0"
