"""Transcript output writers: txt / vtt / srt / tsv / json.

Behavioral equivalents of the reference writers
(/root/reference/whisper/whisper/utils.py:85-318), including the subtitle
line-wrapping state machine and per-word ``<u>`` highlighting.  The subtitle
segmentation is re-expressed as an explicit ``_SubtitleLayout`` accumulator
rather than a nested generator.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Iterator, List, Optional, TextIO, Tuple

from ..utils import format_timestamp, get_start


class ResultWriter:
    extension: str

    def __init__(self, output_dir: str):
        self.output_dir = output_dir

    def __call__(self, result: dict, audio_path: str,
                 options: Optional[dict] = None, **kwargs):
        stem = os.path.splitext(os.path.basename(audio_path))[0]
        out = os.path.join(self.output_dir, f"{stem}.{self.extension}")
        with open(out, "w", encoding="utf-8") as f:
            self.write_result(result, file=f, options=options, **kwargs)

    def write_result(self, result: dict, file: TextIO,
                     options: Optional[dict] = None, **kwargs):
        raise NotImplementedError


class WriteTXT(ResultWriter):
    extension = "txt"

    def write_result(self, result, file, options=None, **kwargs):
        for segment in result["segments"]:
            print(segment["text"].strip(), file=file, flush=True)


class _SubtitleLayout:
    """Greedy word-flow layout: wraps words into lines and lines into
    subtitle blocks under (max_line_width, max_line_count, max_words_per_line)
    constraints, breaking on long pauses and (optionally) segment bounds."""

    def __init__(self, max_line_width, max_line_count, max_words_per_line):
        self.preserve_segments = max_line_count is None or max_line_width is None
        self.max_line_width = max_line_width or 1000
        self.max_line_count = max_line_count
        self.max_words_per_line = max_words_per_line or 1000

    def blocks(self, segments) -> Iterator[List[dict]]:
        line_len = 0
        line_count = 1
        block: List[dict] = []
        last = get_start(segments) or 0.0
        for segment in segments:
            words = segment["words"]
            for chunk_start in range(0, len(words), self.max_words_per_line):
                chunk = words[chunk_start : chunk_start + self.max_words_per_line]
                for i, timing in enumerate(chunk):
                    timing = timing.copy()
                    long_pause = (
                        not self.preserve_segments and timing["start"] - last > 3.0
                    )
                    fits = line_len + len(timing["word"]) <= self.max_line_width
                    seg_break = i == 0 and block and self.preserve_segments
                    if line_len > 0 and fits and not long_pause and not seg_break:
                        line_len += len(timing["word"])
                    else:
                        timing["word"] = timing["word"].strip()
                        if (
                            block
                            and self.max_line_count is not None
                            and (long_pause or line_count >= self.max_line_count)
                            or seg_break
                        ):
                            yield block
                            block = []
                            line_count = 1
                        elif line_len > 0:
                            line_count += 1
                            timing["word"] = "\n" + timing["word"]
                        line_len = len(timing["word"].strip())
                    block.append(timing)
                    last = timing["start"]
        if block:
            yield block


class SubtitlesWriter(ResultWriter):
    always_include_hours: bool
    decimal_marker: str

    def _ts(self, seconds: float) -> str:
        return format_timestamp(
            seconds, self.always_include_hours, self.decimal_marker
        )

    def iterate_result(
        self,
        result: dict,
        options: Optional[dict] = None,
        *,
        max_line_width: Optional[int] = None,
        max_line_count: Optional[int] = None,
        highlight_words: bool = False,
        max_words_per_line: Optional[int] = None,
    ) -> Iterator[Tuple[str, str, str]]:
        options = options or {}
        max_line_width = max_line_width or options.get("max_line_width")
        max_line_count = max_line_count or options.get("max_line_count")
        highlight_words = highlight_words or options.get("highlight_words", False)
        max_words_per_line = max_words_per_line or options.get("max_words_per_line")

        segments = result["segments"]
        if segments and "words" in segments[0]:
            layout = _SubtitleLayout(max_line_width, max_line_count, max_words_per_line)
            for block in layout.blocks(segments):
                text = "".join(w["word"] for w in block)
                if highlight_words:
                    last = self._ts(block[0]["start"])
                    for i, timing in enumerate(block):
                        start = self._ts(timing["start"])
                        end = self._ts(timing["end"])
                        if last != start:
                            yield last, start, text
                        yield start, end, "".join(
                            re.sub(r"^(\s*)(.*)$", r"\1<u>\2</u>", w["word"])
                            if j == i
                            else w["word"]
                            for j, w in enumerate(block)
                        )
                        last = end
                else:
                    yield self._ts(block[0]["start"]), self._ts(block[-1]["end"]), text
        else:
            for segment in segments:
                yield (
                    self._ts(segment["start"]),
                    self._ts(segment["end"]),
                    segment["text"].strip().replace("-->", "->"),
                )


class WriteVTT(SubtitlesWriter):
    extension = "vtt"
    always_include_hours = False
    decimal_marker = "."

    def write_result(self, result, file, options=None, **kwargs):
        print("WEBVTT\n", file=file)
        for start, end, text in self.iterate_result(result, options, **kwargs):
            print(f"{start} --> {end}\n{text}\n", file=file, flush=True)


class WriteSRT(SubtitlesWriter):
    extension = "srt"
    always_include_hours = True
    decimal_marker = ","

    def write_result(self, result, file, options=None, **kwargs):
        for i, (start, end, text) in enumerate(
            self.iterate_result(result, options, **kwargs), start=1
        ):
            print(f"{i}\n{start} --> {end}\n{text}\n", file=file, flush=True)


class WriteTSV(ResultWriter):
    """start/end in integer milliseconds + tab-safe text per line."""

    extension = "tsv"

    def write_result(self, result, file, options=None, **kwargs):
        print("start", "end", "text", sep="\t", file=file)
        for segment in result["segments"]:
            print(round(1000 * segment["start"]), file=file, end="\t")
            print(round(1000 * segment["end"]), file=file, end="\t")
            print(segment["text"].strip().replace("\t", " "), file=file, flush=True)


class WriteJSON(ResultWriter):
    extension = "json"

    def write_result(self, result, file, options=None, **kwargs):
        json.dump(result, file)


_WRITERS = {
    "txt": WriteTXT,
    "vtt": WriteVTT,
    "srt": WriteSRT,
    "tsv": WriteTSV,
    "json": WriteJSON,
}


def get_writer(output_format: str, output_dir: str) -> Callable:
    if output_format == "all":
        all_writers = [cls(output_dir) for cls in _WRITERS.values()]

        def write_all(result, file, options=None, **kwargs):
            for writer in all_writers:
                writer(result, file, options, **kwargs)

        return write_all
    return _WRITERS[output_format](output_dir)
