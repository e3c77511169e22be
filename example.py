"""Minimal end-to-end example of the public API.

The reference's example calls a stub that raises NotImplementedError
(/root/reference/example.py:12-14 vs src/iris/model.py:27). This one runs.
"""

from iris_tts_tpu import TTSPipeline

# Random weights — swap in TTSPipeline.from_checkpoints(...) after training.
pipeline = TTSPipeline.initialize()

audio = pipeline.synthesize("Hello world, this is Iris on TPU.", seed=0)
print(f"synthesized {len(audio)} samples "
      f"({len(audio) / pipeline.config.audio.sample_rate:.2f} s)")

pipeline.synthesize_to_file("Saving straight to disk.", "outputs/example.wav")
print("wrote outputs/example.wav")
