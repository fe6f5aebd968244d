#!/usr/bin/env python3
"""Reference ASR worker for graft.asr.ProcessWordRecognizer.

Speaks the engine's length-prefixed WAV-in / JSON-line-out protocol on
stdin/stdout and runs word-level transcription through the PUBLIC
faster-whisper API (the same ctranslate2 runtime the reference
pipeline's validator uses; its primary pass is WhisperX — a drop-in
variant is sketched at the bottom). One process per Spark executor:
the model loads once, then requests stream through sequentially.

Usage (on a GPU box with `pip install faster-whisper`):

    export GRAFT_ASR_CMD="python3 /opt/asr/asr_worker_fasterwhisper.py \
        --model large-v3 --device cuda"

and wire `ProcessWordRecognizer.ifAvailable()` into the pipeline in
place of the test fake. This file is documentation-plus-example: the
Spark-side plumbing (process lifecycle, protocol framing, JSON word
schema) is spec-tested in-sandbox against a stub worker speaking this
exact protocol; THIS script needs a model runtime and is not
executable in the build sandbox.

Protocol, per request:
  stdin:  {"key": "<id>", "bytes": N}\n   # JSON header line
  stdin:  N raw bytes                      # a complete WAV container
  stdout: {"words": [{"word": "...", "start": 0.42, "end": 0.61,
                      "score": 0.93}, ...]}\n
"""
import argparse
import io
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--device", default="cuda")
    ap.add_argument("--compute-type", default="float16")
    ap.add_argument("--language", default="en")
    args = ap.parse_args()

    # public API: https://github.com/SYSTRAN/faster-whisper
    from faster_whisper import WhisperModel
    model = WhisperModel(args.model, device=args.device,
                         compute_type=args.compute_type)

    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    while True:
        header = stdin.readline()
        if not header:
            return  # engine closed the pipe: clean shutdown
        n = json.loads(header)["bytes"]
        wav = stdin.read(n)
        segments, _info = model.transcribe(
            io.BytesIO(wav), language=args.language,
            word_timestamps=True, beam_size=5)
        words = [
            {"word": w.word.strip(), "start": round(w.start, 3),
             "end": round(w.end, 3), "score": round(w.probability, 4)}
            for seg in segments for w in (seg.words or [])
        ]
        stdout.write((json.dumps({"words": words}) + "\n").encode())
        stdout.flush()


# WhisperX variant (the reference's primary pass: transcription +
# wav2vec2 forced alignment for the 15-20% boundary gain it documents):
#
#   import whisperx, tempfile
#   model = whisperx.load_model("large-v3", device="cuda")
#   align_model, meta = whisperx.load_align_model("en", device="cuda")
#   ...per request:
#   audio = whisperx.load_audio(path_or_buffer)
#   result = model.transcribe(audio, batch_size=16)
#   aligned = whisperx.align(result["segments"], align_model, meta,
#                            audio, device="cuda")
#   words = [{"word": w["word"], "start": w["start"], "end": w["end"],
#             "score": w.get("score", 1.0)}
#            for seg in aligned["segments"] for w in seg["words"]]
#
# Same protocol either way — the engine does not care which backend
# fills the words array.

if __name__ == "__main__":
    main()
