"""Playback adapters (mirrors reference src/playback.rs and the ffplay path
of src/main.rs:200-301).

* `SamplesSource` — an iterator over interleaved f32 samples with the
  rate/channel metadata a sink needs (the rodio `Source` adapter,
  playback.rs:3-66).
* `FfplaySink` / `play_stream_with_ffplay` — pipe f32le chunks to an ffplay
  child process (main.rs:218-274), the only playback path that does not need
  an audio device library.
* `play_files_gapless` — the rodio-style gapless path; without a native audio
  backend in this environment it degrades to the ffplay pipe when available,
  matching the reference's feature-gated fallback messaging (main.rs:181-198).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np


class SamplesSource:
    """reference src/playback.rs:3-66 — iterator over f32 samples."""

    def __init__(self, samples: np.ndarray, sample_rate: int, channels: int):
        self.samples = np.asarray(samples, np.float32)
        self.sample_rate = int(sample_rate)
        self.channels = int(channels)
        self.position = 0

    def __iter__(self) -> Iterator[float]:
        return self

    def __next__(self) -> float:
        if self.position >= len(self.samples):
            raise StopIteration
        v = float(self.samples[self.position])
        self.position += 1
        return v

    # rodio::Source-equivalent metadata (playback.rs:44-66)
    def current_frame_len(self) -> Optional[int]:
        return None

    def total_duration(self) -> Optional[float]:
        return None


def ffplay_available() -> bool:
    return shutil.which("ffplay") is not None


class FfplaySink:
    """A child ffplay process fed f32le over stdin (main.rs:218-274).

    ffplay's output streams go to temp files, not pipes: ffplay rewrites a
    status line continuously, and an undrained 64 KB stderr pipe would fill
    after a few minutes and deadlock the stdin writes (a latent bug in the
    reference's Stdio::piped + wait_with_output approach)."""

    def __init__(self, sample_rate: int, channels: int):
        import tempfile

        self._out = tempfile.TemporaryFile()
        self._err = tempfile.TemporaryFile()
        self.proc = subprocess.Popen(
            [
                "ffplay",
                "-f", "f32le",
                "-ar", str(sample_rate),
                "-ac", str(channels),
                "-nodisp",
                "-autoexit",
                "-",
            ],
            stdin=subprocess.PIPE,
            stdout=self._out,
            stderr=self._err,
        )

    def write(self, samples: np.ndarray) -> bool:
        try:
            self.proc.stdin.write(
                np.asarray(samples, np.float32).astype("<f4").tobytes()
            )
            return True
        except (BrokenPipeError, OSError) as e:
            print(f"Error writing to ffplay: {e}", file=sys.stderr)
            return False

    def close(self) -> int:
        try:
            self.proc.stdin.close()
        except OSError:
            pass
        self.proc.wait()
        if self.proc.returncode != 0:
            print(f"ffplay exited with status: {self.proc.returncode}",
                  file=sys.stderr)
            try:
                self._err.seek(0)
                err = self._err.read()
                if err:
                    print("ffplay stderr:", file=sys.stderr)
                    print(err.decode(errors="replace"), file=sys.stderr)
            except OSError:
                pass
        self._out.close()
        self._err.close()
        return self.proc.returncode


def play_file_with_ffplay(input_path: Path) -> None:
    """main.rs:200-301 — stream one .glc file to ffplay."""
    from .codec.decoder import Decoder
    from .container.bincode import load_encoded

    print(f"Loading: {input_path.name!r}")
    encoded = load_encoded(input_path)
    sample_rate = encoded.header.sample_rate
    channels = encoded.header.channels

    print(f"Playing: {sample_rate} Hz, {channels} channels (via ffplay)")
    print("Press Ctrl+C or close ffplay window to stop")

    try:
        sink = FfplaySink(sample_rate, channels)
    except FileNotFoundError as e:
        print(f"Error: Failed to spawn ffplay: {e}", file=sys.stderr)
        print("Make sure ffplay is installed and in your PATH", file=sys.stderr)
        raise

    decoder = Decoder(channels, sample_rate)
    rx = decoder.decode_streaming(encoded)
    chunks_sent = 0
    try:
        while True:
            chunk = rx.get()
            if chunk.error is not None:
                print(f"Error decoding: {chunk.error}", file=sys.stderr)
                break
            chunks_sent += 1
            if not sink.write(chunk.samples):
                break
            if chunk.is_last:
                break
    finally:
        rx.cancelled.set()
    print(f"Sent {chunks_sent} chunks to ffplay")
    if sink.close() == 0:
        print("Playback finished")


def play_files_gapless(file_paths: List[Path]) -> None:
    """main.rs:115-171 — gapless playback of a .glc playlist.

    The reference uses rodio (a native audio-device library).  This
    environment has no audio device backend, so we feed one continuous
    ffplay pipe — chunks from consecutive files are appended to the same
    sink, which is exactly the gapless property (untrimmed streaming chunks
    appended back-to-back, main.rs:152-161).
    """
    from .codec.decoder import Decoder
    from .container.bincode import load_encoded

    if not file_paths:
        raise ValueError("No files to play")
    if not ffplay_available():
        print("Error: Playback support not available", file=sys.stderr)
        print("No audio backend found; install ffplay (ffmpeg) or use "
              "-p --ffplay explicitly", file=sys.stderr)
        raise RuntimeError("Playback not available")

    sink = None
    sink_params = None
    try:
        for path in file_paths:
            print(f"Loading: {path.name!r}")
            encoded = load_encoded(path)
            params = (encoded.header.sample_rate, encoded.header.channels)
            print(f"Queueing: {params[0]} Hz, {params[1]} channels")
            if params != sink_params:
                # The reference's rodio resamples per source
                # (main.rs:152-161); an ffplay pipe is fixed-format, so a
                # rate/channel change restarts the sink (gapless joins are
                # preserved within runs of matching formats).
                if sink is not None:
                    sink.close()
                sink = FfplaySink(*params)
                sink_params = params
            decoder = Decoder(params[1], params[0])
            rx = decoder.decode_streaming(encoded)
            try:
                while True:
                    chunk = rx.get()
                    if chunk.error is not None:
                        # continue with the next playlist entry, like the
                        # reference's closed-channel recv loop (main.rs:152-161)
                        print(f"Error decoding {path.name}: {chunk.error}",
                              file=sys.stderr)
                        break
                    if not sink.write(chunk.samples):
                        return
                    if chunk.is_last:
                        break
            finally:
                rx.cancelled.set()  # release the producer if we bailed early
        print(f"Playing {len(file_paths)} files gaplessly. "
              "Press Ctrl+C to stop.")
    finally:
        if sink is not None:
            sink.close()
    print("Playback finished")
