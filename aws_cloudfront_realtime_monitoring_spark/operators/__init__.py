"""Operator toolbox. Shared media-decoder limits live here (they are
format-neutral safety caps, not GIF specifics -- r8 review):

- MAX_PIXELS: the decompression-bomb cap every decoder checks before
  allocating (a fuzzed header claiming 65535 x 65535 would otherwise
  allocate gigabytes per payload);
- SLOW_PATH_MAX_PIXELS: the stricter cap for decode paths whose work is
  per-byte Python (PNG defilter rows, progressive JPEG scans) or
  decoupled from payload size (EOB runs) -- bounds hostile-input CPU at
  tens of seconds per payload instead of minutes.
"""

MAX_PIXELS = 1 << 26

SLOW_PATH_MAX_PIXELS = MAX_PIXELS >> 2

from .narrow import to_narrow  # noqa: F401,E402
