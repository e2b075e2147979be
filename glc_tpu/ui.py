"""Debug GUI (mirrors reference src/ui.rs, feature `ui`).

The reference ships an egui desktop app as a debug tool (CHANGELOG.md calls
it a debug surface); this is the tkinter equivalent with the same feature
set and threading model:

* file picker → encode (background thread + progress bar, ui.rs:90-156)
* encoded-file list → playlist management (ui.rs:610-670)
* gapless playlist playback with a stop flag (ui.rs:158-289)
* playlist → single concatenated FLAC export with level slider 0-8
  (the "gapless album join", ui.rs:291-402)
* status rows updated via shared state polled on a timer (the reference's
  Arc<Mutex<String>> cells + repaint loop, ui.rs:21-22, 472-505)

Launched by `glc` with no arguments when a display is available
(main.rs:586-611).
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import List, Optional


class _GuiState:
    def __init__(self):
        self.lock = threading.Lock()
        self.status = "Ready"
        self.detail = ""
        self.encode_progress: Optional[float] = None
        self.export_progress: Optional[float] = None
        self.stop_playback = threading.Event()
        self.playing = False

    def set_status(self, status: str, detail: str = "") -> None:
        with self.lock:
            self.status = status
            self.detail = detail


def run_gui() -> int:
    import tkinter as tk
    from tkinter import filedialog, ttk

    state = _GuiState()
    root = tk.Tk()
    root.title("Gapless Lossy Codec")  # main.rs:594
    root.geometry("900x700")           # main.rs:593

    selected_files: List[Path] = []
    encoded_files: List[Path] = []
    playlist: List[Path] = []

    # --- widgets ---
    frm = ttk.Frame(root, padding=8)
    frm.pack(fill="both", expand=True)

    status_var = tk.StringVar(value="Ready")
    detail_var = tk.StringVar(value="")

    ttk.Label(frm, text="Input files (WAV/FLAC)").pack(anchor="w")
    sel_list = tk.Listbox(frm, height=5)
    sel_list.pack(fill="x")

    row1 = ttk.Frame(frm)
    row1.pack(fill="x", pady=4)

    enc_progress = ttk.Progressbar(frm, maximum=100.0)

    ttk.Label(frm, text="Encoded files (.glc)").pack(anchor="w")
    enc_list = tk.Listbox(frm, height=5)
    enc_list.pack(fill="x")

    row2 = ttk.Frame(frm)
    row2.pack(fill="x", pady=4)

    ttk.Label(frm, text="Playlist").pack(anchor="w")
    play_list = tk.Listbox(frm, height=5)
    play_list.pack(fill="x")

    row3 = ttk.Frame(frm)
    row3.pack(fill="x", pady=4)

    level_var = tk.IntVar(value=5)  # FLAC level slider 0-8 (ui.rs:676-680)
    export_progress = ttk.Progressbar(frm, maximum=100.0)

    ttk.Label(frm, textvariable=status_var).pack(anchor="w", pady=(8, 0))
    ttk.Label(frm, textvariable=detail_var).pack(anchor="w")

    # --- actions ---
    def pick_files():
        names = filedialog.askopenfilenames(
            filetypes=[("Lossless audio", "*.wav *.flac"),
                       ("All files", "*.*")]
        )
        for name in names:
            p = Path(name)
            if p not in selected_files:
                selected_files.append(p)
                sel_list.insert("end", p.name)

    def encode_selected():
        """ui.rs:90-156 — encode each selected file on a worker thread."""
        files = list(selected_files)
        if not files:
            state.set_status("No files selected")
            return

        def work():
            from .codec.encoder import Encoder
            from .container.bincode import save_encoded
            from .io.audio import load_audio_for_encode

            for i, path in enumerate(files):
                try:
                    state.set_status(f"Encoding {path.name}...")
                    state.encode_progress = 0.0
                    samples, rate, ch, is_pcm16 = load_audio_for_encode(path)
                    state.encode_progress = 50.0
                    enc = Encoder(rate)
                    encoded = (enc.encode_pcm16(samples, ch)
                               if is_pcm16
                               else enc.encode(samples, ch))
                    state.encode_progress = 90.0
                    out = path.with_suffix(".glc")
                    save_encoded(encoded, out)
                    state.encode_progress = 100.0
                    encoded_files.append(out)
                    state.set_status(
                        f"Encoded {i + 1}/{len(files)}", str(out)
                    )
                except Exception as e:  # continue-on-error like the CLI
                    state.set_status(f"Error encoding {path.name}", str(e))
            state.encode_progress = None

        threading.Thread(target=work, daemon=True).start()

    def add_to_playlist():
        for i in enc_list.curselection():
            p = encoded_files[i]
            playlist.append(p)
            play_list.insert("end", p.name)

    def clear_playlist():
        playlist.clear()
        play_list.delete(0, "end")

    def play_gapless():
        """ui.rs:158-289 — stream playlist chunks to one sink."""
        files = list(playlist)
        if not files or state.playing:
            return
        state.stop_playback.clear()
        state.playing = True

        def work():
            from .codec.decoder import Decoder
            from .container.bincode import load_encoded
            from .playback import FfplaySink, ffplay_available

            sink = None
            sink_params = None
            try:
                if not ffplay_available():
                    state.set_status("No audio backend (install ffplay)")
                    return
                for path in files:
                    if state.stop_playback.is_set():
                        break
                    encoded = load_encoded(path)
                    params = (encoded.header.sample_rate,
                              encoded.header.channels)
                    if params != sink_params:
                        if sink is not None:
                            sink.close()
                        sink = FfplaySink(*params)
                        sink_params = params
                    state.set_status(f"Playing {path.name}")
                    dec = Decoder(params[1], params[0])
                    rx = dec.decode_streaming(encoded)
                    try:
                        while True:
                            chunk = rx.get()
                            if chunk.error is not None:
                                state.set_status("Decode error", chunk.error)
                                return
                            if state.stop_playback.is_set():
                                break
                            if not sink.write(chunk.samples):
                                break
                            if chunk.is_last:
                                break
                    finally:
                        rx.cancelled.set()
                state.set_status("Playback finished")
            except Exception as e:
                state.set_status("Playback error", str(e))
            finally:
                if sink is not None:
                    sink.close()
                state.playing = False

        threading.Thread(target=work, daemon=True).start()

    def stop_playing():
        state.stop_playback.set()

    def test_audio_device():
        """ui.rs:406-469 — play an arbitrary FLAC to check the audio path."""
        name = filedialog.askopenfilename(
            filetypes=[("FLAC", "*.flac"), ("All files", "*.*")]
        )
        if not name:
            return

        def work():
            from .flac.decoder import read_flac
            from .playback import FfplaySink, ffplay_available

            try:
                if not ffplay_available():
                    state.set_status("No audio backend (install ffplay)")
                    return
                samples, rate, ch = read_flac(name)
                state.set_status(f"Testing device with {Path(name).name}")
                sink = FfplaySink(rate, ch)
                try:
                    sink.write(samples)
                finally:
                    sink.close()
                state.set_status("Device test finished")
            except Exception as e:
                state.set_status("Device test error", str(e))

        threading.Thread(target=work, daemon=True).start()

    def export_playlist():
        """ui.rs:291-402 — decode all, concatenate, single FLAC export."""
        files = list(playlist)
        if not files:
            state.set_status("Playlist is empty")
            return
        out_name = filedialog.asksaveasfilename(
            defaultextension=".flac",
            filetypes=[("FLAC", "*.flac")],
        )
        if not out_name:
            return
        level = int(level_var.get())

        def work():
            from .album import export_playlist_to_flac
            from .container.schema import ProgressKind

            def on_progress(p):
                if p.kind in (ProgressKind.DECODING, ProgressKind.EXPORTING):
                    state.export_progress = float(p.value)
                elif p.kind == ProgressKind.STATUS:
                    state.set_status(str(p.value))

            try:
                export_playlist_to_flac(files, out_name, level, on_progress)
                state.export_progress = 100.0
                state.set_status("Export complete", out_name)
            except Exception as e:
                state.set_status("Export error", str(e))
            finally:
                state.export_progress = None

        threading.Thread(target=work, daemon=True).start()

    ttk.Button(row1, text="Add files...", command=pick_files).pack(
        side="left")
    ttk.Button(row1, text="Encode", command=encode_selected).pack(
        side="left", padx=4)
    ttk.Button(row2, text="Add to playlist", command=add_to_playlist).pack(
        side="left")
    ttk.Button(row2, text="Clear playlist", command=clear_playlist).pack(
        side="left", padx=4)
    ttk.Button(row3, text="Play (gapless)", command=play_gapless).pack(
        side="left")
    ttk.Button(row3, text="Stop", command=stop_playing).pack(
        side="left", padx=4)
    ttk.Label(row3, text="FLAC level").pack(side="left", padx=(16, 2))
    tk.Scale(row3, from_=0, to=8, orient="horizontal",
             variable=level_var).pack(side="left")
    ttk.Button(row3, text="Export playlist → FLAC",
               command=export_playlist).pack(side="left", padx=8)
    ttk.Button(row1, text="Test audio device...",
               command=test_audio_device).pack(side="left", padx=8)

    def poll():
        """100 ms repaint loop (ui.rs:475-478)."""
        with state.lock:
            status_var.set(state.status)
            detail_var.set(state.detail)
        # sync the encoded-files listbox with results produced by worker
        # threads (tkinter widgets must only be touched from this thread)
        while enc_list.size() < len(encoded_files):
            enc_list.insert("end", encoded_files[enc_list.size()].name)
        if state.encode_progress is not None:
            if not enc_progress.winfo_ismapped():
                enc_progress.pack(fill="x")
            enc_progress["value"] = state.encode_progress
        elif enc_progress.winfo_ismapped():
            enc_progress.pack_forget()
        if state.export_progress is not None:
            if not export_progress.winfo_ismapped():
                export_progress.pack(fill="x")
            export_progress["value"] = state.export_progress
        elif export_progress.winfo_ismapped():
            export_progress.pack_forget()
        root.after(100, poll)

    poll()
    root.mainloop()
    return 0
