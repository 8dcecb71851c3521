"""Self-contained SentencePiece implementation (no `sentencepiece` dependency).

The reference leans on HF transformers + the sentencepiece C++ library for
tokenization (requirements.txt:7, processor use at image_database.py:524).
This module reads a ``tokenizer.model`` (SentencePiece ModelProto, protobuf
wire format) directly and implements the two relevant encoding algorithms:

- **Unigram**: Viterbi segmentation maximizing the sum of piece log-probs.
- **BPE**: iterative highest-score adjacent merge (sentencepiece flavor where
  merge priority is the merged piece's score, ties broken left-first).

Normalization implemented: NFKC (when the model's normalizer is an nmt/nfkc
variant), optional extra-whitespace collapse, dummy-prefix insertion and
whitespace escaping to ``▁`` (U+2581). The precompiled_charsmap custom rules
are NOT interpreted (they add a handful of NFKC exceptions); for the ASCII
prompts this pipeline produces ("this is a photo of {query}",
image_database.py:521) the output is identical. Byte-fallback (``<0xNN>``
pieces) is supported for out-of-vocab characters.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

# =============================================================================
# Protobuf wire-format primitives
# =============================================================================


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for a protobuf message body."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field_num, wire_type = tag >> 3, tag & 0x7
        if wire_type == 0:  # varint
            value, pos = _read_varint(buf, pos)
        elif wire_type == 1:  # fixed64
            value = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire_type == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            value = buf[pos : pos + length]
            pos += length
        elif wire_type == 5:  # fixed32
            value = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"Unsupported protobuf wire type {wire_type}")
        yield field_num, wire_type, value


def _f32_from_bits(bits: int) -> float:
    import struct

    return struct.unpack("<f", bits.to_bytes(4, "little"))[0]


# =============================================================================
# ModelProto parsing (sentencepiece_model.proto field numbers)
# =============================================================================

# SentencePiece.Type enum
_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED, _UNUSED, _BYTE = 1, 2, 3, 4, 5, 6

# ModelType enum
UNIGRAM, BPE, WORD, CHAR = 1, 2, 3, 4


@dataclass
class SentencePieceModel:
    pieces: List[str] = field(default_factory=list)
    scores: List[float] = field(default_factory=list)
    types: List[int] = field(default_factory=list)
    model_type: int = UNIGRAM
    unk_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    pad_id: int = -1
    add_dummy_prefix: bool = True
    remove_extra_whitespaces: bool = True
    escape_whitespaces: bool = True
    normalizer_name: str = "nmt_nfkc"
    byte_fallback: bool = False

    # Derived lookup structures (built in __post_init__ / finalize)
    piece_to_id: Dict[str, int] = field(default_factory=dict)
    _byte_ids: Dict[int, int] = field(default_factory=dict)
    _max_piece_len: int = 1

    def finalize(self) -> "SentencePieceModel":
        self.piece_to_id = {}
        for i, p in enumerate(self.pieces):
            # first occurrence wins (duplicate pieces are possible for control)
            self.piece_to_id.setdefault(p, i)
            if self.types[i] == _BYTE and len(p) == 6 and p.startswith("<0x"):
                self._byte_ids[int(p[3:5], 16)] = i
        self._max_piece_len = max((len(p) for p in self.pieces), default=1)
        return self

    @property
    def vocab_size(self) -> int:
        return len(self.pieces)

    # ---------------------------------------------------------- normalization

    def normalize(self, text: str) -> str:
        if "nfkc" in self.normalizer_name:
            text = unicodedata.normalize("NFKC", text)
        if self.remove_extra_whitespaces:
            text = " ".join(text.split())
        if self.add_dummy_prefix and text:
            text = " " + text
        if self.escape_whitespaces:
            text = text.replace(" ", "▁")
        return text

    # --------------------------------------------------------------- encoding

    def encode(self, text: str, out_type: str = "id") -> List:
        """Encode normalized text to piece ids (or pieces)."""
        norm = self.normalize(text)
        if not norm:
            return []
        if self.model_type == BPE:
            pieces = self._encode_bpe(norm)
        else:
            pieces = self._encode_unigram(norm)
        if out_type == "piece":
            return pieces
        return self._pieces_to_ids(pieces)

    def _pieces_to_ids(self, pieces: List[str]) -> List[int]:
        ids: List[int] = []
        for p in pieces:
            pid = self.piece_to_id.get(p)
            if pid is not None and self.types[pid] != _UNUSED:
                ids.append(pid)
                continue
            if self.byte_fallback:
                for b in p.encode("utf-8"):
                    ids.append(self._byte_ids.get(b, self.unk_id))
            else:
                ids.append(self.unk_id)
        return ids

    def _encode_unigram(self, text: str) -> List[str]:
        """Viterbi over the piece lattice (max total log-prob)."""
        n = len(text)
        NEG = -1e18
        best: List[float] = [NEG] * (n + 1)
        back: List[Tuple[int, Optional[str]]] = [(-1, None)] * (n + 1)
        best[0] = 0.0
        p2i = self.piece_to_id
        maxlen = self._max_piece_len
        unk_penalty = min(self.scores) - 10.0 if self.scores else -20.0
        for i in range(n):
            if best[i] <= NEG / 2:
                continue
            matched = False
            limit = min(n, i + maxlen)
            for j in range(i + 1, limit + 1):
                piece = text[i:j]
                pid = p2i.get(piece)
                if pid is None:
                    continue
                t = self.types[pid]
                if t in (_UNKNOWN, _UNUSED):
                    continue
                score = best[i] + self.scores[pid]
                if score > best[j]:
                    best[j] = score
                    back[j] = (i, piece)
                matched = True
            # unknown single character fallback keeps the lattice connected
            if not matched or best[i + 1] <= NEG / 2:
                score = best[i] + unk_penalty
                if score > best[i + 1]:
                    best[i + 1] = score
                    back[i + 1] = (i, text[i : i + 1])
        pieces: List[str] = []
        j = n
        while j > 0:
            i, piece = back[j]
            pieces.append(piece or text[i:j])
            j = i
        pieces.reverse()
        return pieces

    def _encode_bpe(self, text: str) -> List[str]:
        """Greedy merges by merged-piece score (sentencepiece BPE)."""
        symbols = list(text)
        if not symbols:
            return []
        p2i = self.piece_to_id
        while True:
            best_score = None
            best_idx = -1
            for i in range(len(symbols) - 1):
                merged = symbols[i] + symbols[i + 1]
                pid = p2i.get(merged)
                if pid is None or self.types[pid] in (_UNKNOWN, _UNUSED, _CONTROL):
                    continue
                s = self.scores[pid]
                if best_score is None or s > best_score:
                    best_score = s
                    best_idx = i
            if best_idx < 0:
                break
            symbols[best_idx : best_idx + 2] = [symbols[best_idx] + symbols[best_idx + 1]]
        return symbols


def parse_model(data: bytes) -> SentencePieceModel:
    """Parse a serialized ModelProto."""
    m = SentencePieceModel()
    for fnum, wtype, value in _iter_fields(data):
        if fnum == 1 and wtype == 2:  # SentencePiece pieces
            piece, score, ptype = "", 0.0, _NORMAL
            for pf, pw, pv in _iter_fields(value):
                if pf == 1:
                    piece = pv.decode("utf-8")
                elif pf == 2 and pw == 5:
                    score = _f32_from_bits(pv)
                elif pf == 3:
                    ptype = pv
            m.pieces.append(piece)
            m.scores.append(score)
            m.types.append(ptype)
        elif fnum == 2 and wtype == 2:  # TrainerSpec
            for tf, _, tv in _iter_fields(value):
                if tf == 3:
                    m.model_type = tv
                elif tf == 35:
                    m.byte_fallback = bool(tv)
                elif tf == 40:
                    m.unk_id = tv
                elif tf == 41:
                    m.bos_id = _signed(tv)
                elif tf == 42:
                    m.eos_id = _signed(tv)
                elif tf == 43:
                    m.pad_id = _signed(tv)
        elif fnum == 3 and wtype == 2:  # NormalizerSpec
            for nf, _, nv in _iter_fields(value):
                if nf == 1:
                    m.normalizer_name = nv.decode("utf-8")
                elif nf == 3:
                    m.add_dummy_prefix = bool(nv)
                elif nf == 4:
                    m.remove_extra_whitespaces = bool(nv)
                elif nf == 5:
                    m.escape_whitespaces = bool(nv)
    return m.finalize()


def _signed(v: int) -> int:
    """Protobuf int32 negative values arrive as 64-bit two's complement varints."""
    if v >= 1 << 63:
        return v - (1 << 64)
    if v >= 1 << 31:
        return v - (1 << 32)
    return v


def load_model(path: str) -> SentencePieceModel:
    with open(path, "rb") as f:
        return parse_model(f.read())


# =============================================================================
# Serialization (for tests: build a tiny model file without sentencepiece)
# =============================================================================


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wtype: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wtype) + payload


def serialize_model(m: SentencePieceModel) -> bytes:
    """Serialize to ModelProto wire format (subset round-trippable by parse_model)."""
    import struct

    out = bytearray()
    for piece, score, ptype in zip(m.pieces, m.scores, m.types):
        body = bytearray()
        pb = piece.encode("utf-8")
        body += _field(1, 2, _varint(len(pb)) + pb)
        body += _field(2, 5, struct.pack("<f", score))
        body += _field(3, 0, _varint(ptype))
        out += _field(1, 2, _varint(len(body)) + bytes(body))
    trainer = bytearray()
    trainer += _field(3, 0, _varint(m.model_type))
    trainer += _field(35, 0, _varint(int(m.byte_fallback)))
    trainer += _field(40, 0, _varint(m.unk_id))
    for num, vid in ((41, m.bos_id), (42, m.eos_id), (43, m.pad_id)):
        trainer += _field(num, 0, _varint(vid & 0xFFFFFFFFFFFFFFFF if vid < 0 else vid))
    out += _field(2, 2, _varint(len(trainer)) + bytes(trainer))
    norm = bytearray()
    nb = m.normalizer_name.encode("utf-8")
    norm += _field(1, 2, _varint(len(nb)) + nb)
    norm += _field(3, 0, _varint(int(m.add_dummy_prefix)))
    norm += _field(4, 0, _varint(int(m.remove_extra_whitespaces)))
    norm += _field(5, 0, _varint(int(m.escape_whitespaces)))
    out += _field(3, 2, _varint(len(norm)) + bytes(norm))
    return bytes(out)
