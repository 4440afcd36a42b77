"""parse-ext plugin (src/plugin/parse-ext/ExtParser.java:25-160): parse
by piping the raw content through an external command — the command's
stdout becomes the parse text.

Per-type registry mirrors the reference's TYPE_PARAMS_MAP
{contentType: (command, timeout, encoding)}. DIVERGENCE, documented:
the reference appends the content type as a trailing command argument
(ExtParser.java:87); here it is omitted by default (a trailing
``text/plain`` arg makes stdin-filters like ``cat`` read a
nonexistent file) — pass ``append_type=True`` for commands that want
it.
"""

from __future__ import annotations

import shlex
import subprocess


class ExtParseError(Exception):
    pass


class ExtParser:
    """type_params: {content_type: (command, timeout_s[, encoding])}."""

    def __init__(self, type_params: dict, append_type: bool = False):
        self.type_params = {k.lower(): tuple(v) for k, v in type_params.items()}
        self.append_type = append_type

    def can_parse(self, content_type: str) -> bool:
        return (content_type or "").lower() in self.type_params

    def parse(self, content: bytes, content_type: str) -> str:
        params = self.type_params.get((content_type or "").lower())
        if params is None:
            raise ExtParseError(
                f"No external command defined for contentType: {content_type}")
        command, timeout = params[0], float(params[1])
        encoding = params[2] if len(params) > 2 else "utf-8"
        argv = shlex.split(command)
        if self.append_type:
            argv.append(content_type)
        try:
            proc = subprocess.run(
                argv, input=bytes(content), capture_output=True, timeout=timeout)
        except (subprocess.TimeoutExpired, OSError) as e:
            raise ExtParseError(f"External command {command} failed: {e}")
        if proc.returncode != 0:
            raise ExtParseError(
                f"External command {command} failed with error: "
                f"{proc.stderr.decode('utf-8', 'replace')[:200]}")
        return proc.stdout.decode(encoding, errors="replace").strip()
