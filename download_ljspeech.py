"""Download and extract the LJSpeech-1.1 corpus (reference:
/root/reference/download_ljspeech.py)."""

import argparse

from iris_tts_tpu.data.ljspeech import download_ljspeech

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dest", type=str, default="data")
    args = parser.parse_args()
    path = download_ljspeech(args.dest)
    print(f"LJSpeech ready at {path}")
