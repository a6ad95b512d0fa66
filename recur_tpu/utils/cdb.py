"""Pure-Python reader/writer for djb's constant database (CDB) format.

The reference stores nets as CDB key→value files (recur-nn-io.c via libcdb).
This is a from-scratch implementation of the public CDB format
(https://cr.yp.to/cdb.html): a 2048-byte table-of-contents of 256 (pos, len)
pairs, followed by the records, followed by 256 hash tables of (hash, pos)
slots.  All integers are little-endian u32.

Files we write are readable by libcdb / python-cdb and vice versa, which keeps
.net files bit-compatible with the reference (BASELINE.json north star).
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import tempfile


def cdb_hash(key: bytes) -> int:
    h = 5381
    for c in key:
        h = ((h << 5) + h) & 0xFFFFFFFF
        h ^= c
    return h & 0xFFFFFFFF


class Reader:
    """Random and sequential access to a CDB file held in memory."""

    def __init__(self, data: bytes):
        if len(data) < 2048:
            raise ValueError("not a cdb file: shorter than header")
        self.data = data
        self.tables = struct.unpack("<512I", data[:2048])

    @classmethod
    def open(cls, path: str | os.PathLike) -> "Reader":
        with open(path, "rb") as f:
            return cls(f.read())

    def get(self, key: bytes | str, default: bytes | None = None) -> bytes | None:
        if isinstance(key, str):
            key = key.encode("utf-8")
        h = cdb_hash(key)
        tpos = self.tables[(h & 255) * 2]
        tlen = self.tables[(h & 255) * 2 + 1]
        if tlen == 0:
            return default
        start = (h >> 8) % tlen
        for i in range(tlen):
            slot = tpos + (((start + i) % tlen) * 8)
            slot_hash, rec_pos = struct.unpack_from("<II", self.data, slot)
            if rec_pos == 0:
                return default
            if slot_hash != h:
                continue
            klen, vlen = struct.unpack_from("<II", self.data, rec_pos)
            if klen == len(key) and self.data[rec_pos + 8:rec_pos + 8 + klen] == key:
                off = rec_pos + 8 + klen
                return self.data[off:off + vlen]
        return default

    def __contains__(self, key) -> bool:
        return self.get(key) is not None

    def __getitem__(self, key) -> bytes:
        v = self.get(key)
        if v is None:
            raise KeyError(key)
        return v

    def items(self):
        """Yield (key, value) pairs in file order (sequential record scan)."""
        end = min(self.tables[0::2]) if self.tables else len(self.data)
        pos = 2048
        while pos < end:
            klen, vlen = struct.unpack_from("<II", self.data, pos)
            key = self.data[pos + 8:pos + 8 + klen]
            val = self.data[pos + 8 + klen:pos + 8 + klen + vlen]
            yield key, val
            pos += 8 + klen + vlen

    def keys(self):
        return (k for k, _ in self.items())


class Writer:
    """Build a CDB file; mirrors cdb_make_start/add/finish."""

    def __init__(self):
        self._records: list[tuple[int, int]] = []  # (hash, pos)
        self._buf = io.BytesIO()
        self._buf.write(b"\0" * 2048)

    def add(self, key: bytes | str, value: bytes):
        if isinstance(key, str):
            key = key.encode("utf-8")
        pos = self._buf.tell()
        self._buf.write(struct.pack("<II", len(key), len(value)))
        self._buf.write(key)
        self._buf.write(value)
        self._records.append((cdb_hash(key), pos))

    def tobytes(self) -> bytes:
        # bucket records into the 256 tables
        buckets: list[list[tuple[int, int]]] = [[] for _ in range(256)]
        for h, pos in self._records:
            buckets[h & 255].append((h, pos))
        header = bytearray(2048)
        buf = self._buf
        for t in range(256):
            entries = buckets[t]
            tlen = len(entries) * 2
            tpos = buf.tell()
            struct.pack_into("<II", header, t * 8, tpos, tlen)
            if tlen == 0:
                continue
            slots = [(0, 0)] * tlen
            for h, pos in entries:
                i = (h >> 8) % tlen
                while slots[i][1] != 0:
                    i = (i + 1) % tlen
                slots[i] = (h, pos)
            for h, pos in slots:
                buf.write(struct.pack("<II", h, pos))
        data = bytearray(buf.getvalue())
        data[:2048] = header
        return bytes(data)

    def write(self, path: str | os.PathLike, backup: bool = False):
        """Atomic tmpfile+rename write, optional `~` backup (recur-nn-io.c:21,126-138)."""
        path = os.fspath(path)
        d = os.path.dirname(path) or "."
        fd, tmp = tempfile.mkstemp(prefix="tmp_net_", dir=d)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(self.tobytes())
            if backup and os.path.exists(path):
                # hard-link (not rename) so `path` never stops existing:
                # a kill between a rename-away and the rename-in would
                # otherwise lose the net, and a watchdog-retried run then
                # restarts from generation 0 (observed round 3d).  Link to
                # a temp name and os.replace over `~` so a failed link
                # never destroys the previous backup.
                try:
                    os.link(path, tmp + "~")
                    os.replace(tmp + "~", path + "~")
                except OSError:
                    try:  # no-hardlink fs: copy (slower but a backup exists)
                        shutil.copyfile(path, tmp + "~")
                        os.replace(tmp + "~", path + "~")
                    except OSError:
                        pass
                finally:
                    if os.path.exists(tmp + "~"):
                        os.unlink(tmp + "~")
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
