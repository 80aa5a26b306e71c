"""MQ arithmetic coder (ITU-T T.88 Annex E / ISO 15444-1 Annex C) — the
adaptive binary arithmetic coder shared by JBIG2 and JPEG 2000, from
scratch.

The probability state machine (Qe/NMPS/NLPS/SWITCH, 47 states) is the
public spec table; the encode/decode procedures follow the software-
conventions flowcharts (byte-stuffing at 0xFF, conditional MPS/LPS
exchange, renormalization shifts) as implemented by the open reference
codecs (OpenJPEG's mqc.c, jbig2dec) — re-derived here in Python, verified
by exhaustive encode/decode round-trips over adversarial bit patterns and
multi-context streams.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

# (Qe, NMPS, NLPS, SWITCH) — T.88 Table E.1
QE_TABLE: Tuple[Tuple[int, int, int, int], ...] = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQEncoder:
    """Contexts are caller-managed indices into ``self.cx`` — a list of
    [state_index, mps] pairs (one per context label)."""

    def __init__(self, n_contexts: int) -> None:
        self.cx: List[List[int]] = [[0, 0] for _ in range(n_contexts)]
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self._b = -1  # last placed byte ("BP" points here); -1 = none yet

    # -- internals ----------------------------------------------------------
    def _byteout(self) -> None:
        if self._b == 0xFF:
            self.out.append(0xFF)
            self._b = (self.c >> 20) & 0xFF
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                if self._b >= 0:
                    self.out.append(self._b)
                self._b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                self._b += 1
                if self._b == 0xFF:
                    self.c &= 0x7FFFFFF
                    self.out.append(0xFF)
                    self._b = (self.c >> 20) & 0xFF
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    if self._b >= 0:
                        self.out.append(self._b)
                    self._b = (self.c >> 19) & 0xFF
                    self.c &= 0x7FFFF
                    self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    # -- API ----------------------------------------------------------------
    def encode(self, d: int, cxi: int, cx: Optional[List[List[int]]] = None) -> None:
        """``cx`` overrides the context array — JBIG2 symbol/text segments
        run several independent context spaces (GB, IADH, IADW, IAID, ...)
        over ONE arithmetic codestream (T.88 §6.4-6.5)."""
        st = (cx if cx is not None else self.cx)[cxi]
        qe, nmps, nlps, switch = QE_TABLE[st[0]]
        if d == st[1]:  # MPS path
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:  # conditional exchange
                    self.a = qe
                else:
                    self.c += qe
                st[0] = nmps
                self._renorm()
            else:
                self.c += qe
        else:  # LPS path
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                st[1] = 1 - st[1]
            st[0] = nlps
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS + two byteouts (software conventions; OpenJPEG mqc_flush)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFF
        self._byteout()
        if self._b >= 0 and self._b != 0xFF:
            self.out.append(self._b)
        return bytes(self.out)


class MQDecoder:
    def __init__(self, data: bytes, n_contexts: int) -> None:
        self.cx: List[List[int]] = [[0, 0] for _ in range(n_contexts)]
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        cur = data[bp] if bp < len(data) else 0xFF
        if cur == 0xFF:
            nxt = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nxt = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def decode(self, cxi: int, cx: Optional[List[List[int]]] = None) -> int:
        st = (cx if cx is not None else self.cx)[cxi]
        qe, nmps, nlps, switch = QE_TABLE[st[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = 1 - st[1]
                if switch:
                    st[1] = 1 - st[1]
                st[0] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - st[1]
                    if switch:
                        st[1] = 1 - st[1]
                    st[0] = nlps
                else:
                    d = st[1]
                    st[0] = nmps
                self._renorm()
            else:
                d = st[1]
        return d
