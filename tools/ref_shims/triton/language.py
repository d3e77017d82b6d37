"""triton.language stub: attributes referenced in stubbed-kernel signatures
(tl.constexpr annotations are evaluated at def time) and bodies (never
executed)."""


class constexpr:  # annotation sentinel
    pass


class _Dtype:
    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return f"tl.{self.name}"


float16 = _Dtype("float16")
float32 = _Dtype("float32")


def __getattr__(name):
    def _unavailable(*a, **k):
        raise RuntimeError(f"triton stub: tl.{name} is unavailable off-GPU")

    return _unavailable
