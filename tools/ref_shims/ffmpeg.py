"""ffmpeg-python stand-in for the reference-in-the-loop parity harness.

The reference pipes every downloaded audio blob through
``ffmpeg.input("pipe:0").output("pipe:", format="wav", acodec="pcm_s16le",
ac=1, ar=sr).run(input=..., capture_stdout=True, capture_stderr=True)``
(reference dataset.py:155-161).  The parity fixtures are WAV, so this shim
decodes the input in numpy, downmixes/resamples, and re-encodes PCM16 mono
WAV — the exact stream the real pipeline would produce for these inputs.
"""

import _shimwav


class Error(Exception):
    def __init__(self, msg, stdout=b"", stderr=None):
        super().__init__(msg)
        self.stdout = stdout
        self.stderr = stderr if stderr is not None else str(msg).encode()


class _Stream:
    def __init__(self, source):
        self.source = source
        self.out_kwargs = {}

    def output(self, target, **kwargs):
        self.out_kwargs = kwargs
        return self

    def run(self, input=None, capture_stdout=False, capture_stderr=False):
        fmt = self.out_kwargs.get("format")
        codec = self.out_kwargs.get("acodec")
        if fmt != "wav" or codec != "pcm_s16le":
            raise Error(f"shim supports wav/pcm_s16le only, got {fmt}/{codec}")
        if int(self.out_kwargs.get("ac", 1)) != 1:
            raise Error("shim supports mono output only")
        target_sr = int(self.out_kwargs["ar"])
        try:
            x, sr = _shimwav.read_wav(input)
        except Exception as e:  # mirrors ffmpeg's nonzero-exit behavior
            raise Error("decode failed", stderr=str(e).encode())
        x = _shimwav.resample_linear(x, sr, target_sr)
        return _shimwav.write_wav_s16(x, target_sr), b""


def input(source):  # noqa: A001 - ffmpeg-python's public name
    return _Stream(source)
