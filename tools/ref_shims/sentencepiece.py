"""sentencepiece stand-in for the reference-in-the-loop parity harness.

The reference uses four calls (reference train.py:91-97,205,239-240):
``SentencePieceProcessor().load(path)``, ``get_piece_size()``,
``encode(text, out_type=int)`` and ``decode_ids(ids)``.  The parity harness
trains a statecatcher char tokenizer and saves it as the JSON this shim
loads — both engines therefore share one exact token mapping (piece 0 is
the never-emitted blank, matching the reference's blank_id=0 convention,
train.py:96).

Standalone on purpose: reads the tokenizer JSON directly instead of
importing statecatcher_tpu (keeps the reference subprocess free of JAX).
"""

import json


class SentencePieceProcessor:
    def __init__(self):
        self._pieces = []
        self._id_of = {}

    def load(self, path):
        with open(path) as f:
            d = json.load(f)
        if d.get("type") != "char":
            raise ValueError(f"shim supports char tokenizer JSON, got {d.get('type')!r}")
        chars = d["chars"]
        self._pieces = ["<blk>", "<unk>"] + list(chars)
        self._id_of = {c: i + 2 for i, c in enumerate(chars)}
        return True

    # sentencepiece also spells this Load(); the reference uses .load()
    Load = load

    def get_piece_size(self):
        return len(self._pieces)

    GetPieceSize = get_piece_size

    def encode(self, text, out_type=int):
        assert out_type is int
        return [self._id_of.get(c, 1) for c in text]

    def decode_ids(self, ids):
        out = []
        for i in ids:
            if i in (0, 1):
                continue
            if 0 <= i < len(self._pieces):
                out.append(self._pieces[i])
        return "".join(out)

    def id_to_piece(self, i):
        return self._pieces[i]
