"""Scripted-socket MySQL replication server for wire-level tests.

Speaks enough of the real server side of the MySQL protocol to drive
``binwatch_spark.sources.binlog_wire`` end-to-end over TCP: HandshakeV10
with genuine ``mysql_native_password`` verification (a wrong scramble is
rejected with ERR 1045, not waved through), text-protocol resultsets for
the session/metadata queries a replica issues, COM_REGISTER_SLAVE, and
COM_BINLOG_DUMP / COM_BINLOG_DUMP_GTID answered with REAL binlog event
bytes — 19-byte headers, v2 rows-event layouts, TABLE_MAP column
metadata, and CRC32 trailers computed with zlib, the exact bytes a
mysqld with ``binlog_checksum=CRC32`` puts on the wire.

Scriptability for fault soaks: each dump connection consumes one entry
of ``dump_plans`` — ``{"disconnect_after": k}`` closes the socket hard
after k event packets (mid-stream failure), ``{"err": (code, msg)}``
refuses the dump outright (e.g. ER 1236) — so the client's reconnect
machinery is exercised against real socket teardowns, not injected
exceptions.
"""

from __future__ import annotations

import socket
import struct
import threading
import zlib

from binwatch_spark.sources.binlog_wire import (
    DELETE_ROWS_EVENT_V2,
    EVENT_HEADER,
    FORMAT_DESCRIPTION_EVENT,
    GTID_LOG_EVENT,
    MYSQL_TYPE_BLOB,
    MYSQL_TYPE_LONG,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    QUERY_EVENT,
    ROTATE_EVENT,
    TABLE_MAP_EVENT,
    UPDATE_ROWS_EVENT_V2,
    WRITE_ROWS_EVENT_V2,
    XID_EVENT,
    read_packet,
    scramble_native_password,
    send_packet,
)

SERVER_VERSION = "8.0.36-fake-wire"


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes((n,))
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    return b"\xfd" + struct.pack("<I", n)[:3]


def _lenenc_str(s: bytes) -> bytes:
    return _lenenc(len(s)) + s


# ------------------------------------------------------ event builders --


class BinlogScript:
    """Builds a scripted binlog as REAL event bytes with running
    positions: each ``add_*`` computes event_size and end log_pos and
    appends the CRC32 trailer when checksum is on. ``events`` is the
    list of (file, end_pos, wire_bytes) the server streams."""

    def __init__(
        self, file: str = "mysql-bin.000001", checksum: str = "CRC32"
    ):
        self.file = file
        self.checksum = checksum
        self.pos = 4
        self.events: list[tuple[str, int, bytes]] = []
        self._table_ids: dict[tuple[str, str], int] = {}
        self.add_format_description()

    def _emit(self, etype: int, body: bytes, log_pos: int | None = None):
        crc_len = 4 if self.checksum == "CRC32" else 0
        size = EVENT_HEADER.size + len(body) + crc_len
        if log_pos is None:
            self.pos += size
            log_pos = self.pos
        data = EVENT_HEADER.pack(1700000000, etype, 1, size, log_pos, 0)
        data += body
        if crc_len:
            data += struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF)
        self.events.append((self.file, log_pos, data))

    def add_format_description(self):
        body = struct.pack("<H", 4)  # binlog version
        body += SERVER_VERSION.encode().ljust(50, b"\x00")
        body += struct.pack("<IB", 1700000000, EVENT_HEADER.size)
        body += bytes(39)  # post-header length table (content unused here)
        body += bytes((1 if self.checksum == "CRC32" else 0,))
        self._emit(FORMAT_DESCRIPTION_EVENT, body)

    def add_rotate(self, next_file: str, artificial: bool = False):
        body = struct.pack("<Q", 4) + next_file.encode()
        if artificial:
            # fake rotate the server sends at dump start: log_pos 0
            self._emit(ROTATE_EVENT, body, log_pos=0)
            self.file = next_file
            self.pos = 4
        else:
            self._emit(ROTATE_EVENT, body)
            self.file = next_file
            self.pos = 4
            # every real binlog file opens with its own FDE
            self.add_format_description()

    def add_gtid(self, uuid: str, gno: int):
        body = b"\x01" + bytes.fromhex(uuid.replace("-", ""))
        body += struct.pack("<q", gno)
        self._emit(GTID_LOG_EVENT, body)

    def add_query(self, sql: str, schema: str = ""):
        s = schema.encode()
        body = struct.pack("<IIBHH", 1, 0, len(s), 0, 0)
        body += s + b"\x00" + sql.encode()
        self._emit(QUERY_EVENT, body)

    def add_xid(self, xid: int = 1):
        self._emit(XID_EVENT, struct.pack("<Q", xid))

    def _table_id(self, schema: str, table: str) -> int:
        key = (schema, table)
        if key not in self._table_ids:
            self._table_ids[key] = 100 + len(self._table_ids)
        return self._table_ids[key]

    def add_table_map(self, schema: str, table: str, cols: list[tuple]):
        """cols: [(name, kind[, meta])] with kind in
        long | longlong | varchar | blob. Names are NOT on the wire
        (pre-8.0 table maps) — pair with FakeMySQLServer.info_schema."""
        tid = self._table_id(schema, table)
        body = int(tid).to_bytes(6, "little") + struct.pack("<H", 1)
        s, t = schema.encode(), table.encode()
        body += bytes((len(s),)) + s + b"\x00"
        body += bytes((len(t),)) + t + b"\x00"
        body += _lenenc(len(cols))
        kinds = {
            "long": MYSQL_TYPE_LONG,
            "longlong": MYSQL_TYPE_LONGLONG,
            "varchar": MYSQL_TYPE_VARCHAR,
            "blob": MYSQL_TYPE_BLOB,
        }
        body += bytes(kinds[c[1]] for c in cols)
        meta = b""
        for c in cols:
            if c[1] == "varchar":
                meta += struct.pack("<H", c[2] if len(c) > 2 else 255)
            elif c[1] == "blob":
                meta += bytes((c[2] if len(c) > 2 else 2,))
        body += _lenenc_str(meta)
        body += bytes((0xFF,) * ((len(cols) + 7) // 8))  # nullable bitmap
        self._cols = cols
        self._emit(TABLE_MAP_EVENT, body)

    def _encode_image(self, cols: list[tuple], values: dict) -> bytes:
        null_bm = bytearray((len(cols) + 7) // 8)
        payload = b""
        for i, c in enumerate(cols):
            v = values.get(c[0])
            if v is None:
                null_bm[i // 8] |= 1 << (i % 8)
                continue
            if c[1] == "long":
                payload += struct.pack("<i", v)
            elif c[1] == "longlong":
                payload += struct.pack("<q", v)
            elif c[1] == "varchar":
                raw = v.encode() if isinstance(v, str) else bytes(v)
                maxlen = c[2] if len(c) > 2 else 255
                if maxlen < 256:
                    payload += bytes((len(raw),)) + raw
                else:
                    payload += struct.pack("<H", len(raw)) + raw
            elif c[1] == "blob":
                raw = v.encode() if isinstance(v, str) else bytes(v)
                nlen = c[2] if len(c) > 2 else 2
                payload += len(raw).to_bytes(nlen, "little") + raw
        return bytes(null_bm) + payload

    def _rows_body(self, schema, table, cols, images: list[bytes], etype):
        tid = self._table_id(schema, table)
        body = int(tid).to_bytes(6, "little") + struct.pack("<H", 1)
        body += struct.pack("<H", 2)  # v2 extra-data: just its own length
        body += _lenenc(len(cols))
        present = bytes((0xFF,) * ((len(cols) + 7) // 8))
        body += present
        if etype == UPDATE_ROWS_EVENT_V2:
            body += present
        body += b"".join(images)
        return body

    def add_write_rows(self, schema, table, cols, rows: list[dict]):
        images = [self._encode_image(cols, r) for r in rows]
        self._emit(
            WRITE_ROWS_EVENT_V2,
            self._rows_body(schema, table, cols, images, WRITE_ROWS_EVENT_V2),
        )

    def add_delete_rows(self, schema, table, cols, rows: list[dict]):
        images = [self._encode_image(cols, r) for r in rows]
        self._emit(
            DELETE_ROWS_EVENT_V2,
            self._rows_body(
                schema, table, cols, images, DELETE_ROWS_EVENT_V2
            ),
        )

    def add_update_rows(self, schema, table, cols, rows: list[tuple]):
        """rows: [(before_dict, after_dict)]"""
        images = []
        for before, after in rows:
            images.append(self._encode_image(cols, before))
            images.append(self._encode_image(cols, after))
        self._emit(
            UPDATE_ROWS_EVENT_V2,
            self._rows_body(
                schema, table, cols, images, UPDATE_ROWS_EVENT_V2
            ),
        )


# --------------------------------------------------------------- server --


class FakeMySQLServer(threading.Thread):
    """Threaded scripted replication server on 127.0.0.1:<ephemeral>.

    - ``user`` / ``password``: credentials verified against the real
      mysql_native_password scramble.
    - ``script``: a BinlogScript; positional dumps filter its events by
      (file, end_pos) > requested — the filtering a real dump does.
    - ``info_schema``: {(schema, table): [(col, data_type, charset)]}
      answering the client's column probe.
    - ``dump_plans``: per-dump-connection fault script (see module doc).
    - ``gtid_serve_from``: {auto_position_text: index} — optional exact
      expected-set → serve-index mapping for GTID dumps; otherwise GTID
      dumps serve the whole script (the client's set filter does the
      dedupe, which is NOT how a real primary behaves — prefer the map).
    """

    def __init__(
        self,
        script: BinlogScript,
        user: str = "repl",
        password: str = "replpw",
        info_schema: dict | None = None,
        dump_plans: list | None = None,
        master_status: tuple | None = None,
        gtid_serve_from: dict | None = None,
        variables: dict | None = None,
    ):
        super().__init__(daemon=True)
        self.script = script
        self.user = user
        self.password = password
        self.info_schema = info_schema or {}
        self.dump_plans = list(dump_plans or [])
        self.gtid_serve_from = gtid_serve_from or {}
        self.variables = {"binlog_checksum": script.checksum}
        self.variables.update(variables or {})
        if master_status is None and script.events:
            f, p, _ = script.events[-1]
            master_status = (f, p, "")
        self.master_status_row = master_status
        self.dump_requests: list[dict] = []
        self.register_requests: list[int] = []
        self.auth_failures = 0
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind(("127.0.0.1", 0))
        self._listener.listen(16)
        self.port = self._listener.getsockname()[1]
        self._stop = threading.Event()
        self._dump_count = 0
        self._lock = threading.Lock()

    # -- packet helpers --

    def _ok(self, sock, seq):
        send_packet(sock, seq, b"\x00\x00\x00\x02\x00\x00\x00")

    def _err(self, sock, seq, code, msg):
        send_packet(
            sock,
            seq,
            b"\xff"
            + struct.pack("<H", code)
            + b"#HY000"
            + msg.encode("utf-8"),
        )

    def _eof(self, sock, seq):
        send_packet(sock, seq, b"\xfe\x00\x00\x02\x00")

    def _resultset(self, sock, names: list[str], rows: list[tuple]):
        seq = 1
        send_packet(sock, seq, _lenenc(len(names)))
        for name in names:
            seq += 1
            n = name.encode()
            col = (
                _lenenc_str(b"def")
                + _lenenc_str(b"")
                + _lenenc_str(b"")
                + _lenenc_str(b"")
                + _lenenc_str(n)
                + _lenenc_str(n)
                + bytes((0x0C,))
                + struct.pack("<HIBHB", 33, 255, 0xFD, 0, 0)
                + b"\x00\x00"
            )
            send_packet(sock, seq, col)
        seq += 1
        self._eof(sock, seq)
        for row in rows:
            seq += 1
            out = b""
            for v in row:
                if v is None:
                    out += b"\xfb"
                else:
                    out += _lenenc_str(str(v).encode("utf-8"))
            send_packet(sock, seq, out)
        seq += 1
        self._eof(sock, seq)

    # -- lifecycle --

    def stop(self):
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def run(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    # -- connection handling --

    def _serve_conn(self, sock: socket.socket):
        try:
            self._handshake(sock)
            while True:
                try:
                    _seq, cmd = read_packet(sock)
                except OSError:
                    return
                if not cmd or cmd[0] == 0x01:  # COM_QUIT
                    return
                if cmd[0] == 0x03:  # COM_QUERY
                    self._handle_query(sock, cmd[1:].decode("utf-8"))
                elif cmd[0] == 0x15:  # COM_REGISTER_SLAVE
                    self.register_requests.append(
                        struct.unpack_from("<I", cmd, 1)[0]
                    )
                    self._ok(sock, 1)
                elif cmd[0] == 0x12:  # COM_BINLOG_DUMP
                    pos, _flags, sid = struct.unpack_from("<IHI", cmd, 1)
                    fname = cmd[11:].decode("utf-8")
                    self._serve_dump(
                        sock, {"file": fname, "pos": pos, "server_id": sid}
                    )
                    return
                elif cmd[0] == 0x1E:  # COM_BINLOG_DUMP_GTID
                    self._serve_dump(sock, self._parse_gtid_dump(cmd))
                    return
                else:
                    self._err(sock, 1, 1047, f"unknown command {cmd[0]}")
        except OSError:
            pass
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def _handshake(self, sock):
        import os

        nonce = bytes(b % 255 + 1 for b in os.urandom(20))  # no NULs
        greet = (
            bytes((10,))
            + SERVER_VERSION.encode()
            + b"\x00"
            + struct.pack("<I", 7)
            + nonce[:8]
            + b"\x00"
            + struct.pack("<H", 0xFFFF)
            + bytes((33,))
            + struct.pack("<H", 2)
            + struct.pack("<H", 0xFFFF)
            + bytes((21,))
            + bytes(10)
            + nonce[8:]
            + b"\x00"
            + b"mysql_native_password\x00"
        )
        send_packet(sock, 0, greet)
        _seq, resp = read_packet(sock)
        off = 4 + 4 + 1 + 23  # caps, maxpkt, charset, filler
        end = resp.index(b"\x00", off)
        user = resp[off:end].decode()
        off = end + 1
        tok_len = resp[off]
        token = resp[off + 1 : off + 1 + tok_len]
        expected = scramble_native_password(self.password, nonce)
        if user != self.user or token != expected:
            self.auth_failures += 1
            self._err(
                sock, 2, 1045, f"Access denied for user '{user}'"
            )
            raise OSError("auth failed")
        self._ok(sock, 2)

    def _handle_query(self, sock, sql: str):
        q = sql.strip().lower()
        if q.startswith("set "):
            self._ok(sock, 1)
        elif q.startswith("show global variables like"):
            name = sql.split("'")[1].lower()
            val = self.variables.get(name)
            rows = [(name, val)] if val is not None else []
            self._resultset(sock, ["Variable_name", "Value"], rows)
        elif q.startswith("show master status"):
            if self.master_status_row is None:
                self._resultset(sock, ["File", "Position"], [])
            else:
                f, p, g = self.master_status_row
                self._resultset(
                    sock,
                    [
                        "File",
                        "Position",
                        "Binlog_Do_DB",
                        "Binlog_Ignore_DB",
                        "Executed_Gtid_Set",
                    ],
                    [(f, p, "", "", g)],
                )
        elif "information_schema.columns" in q:
            schema = sql.split("table_schema='")[1].split("'")[0]
            table = sql.split("table_name='")[1].split("'")[0]
            rows = self.info_schema.get((schema, table), [])
            self._resultset(
                sock,
                ["COLUMN_NAME", "DATA_TYPE", "CHARACTER_SET_NAME"],
                rows,
            )
        else:
            self._resultset(sock, ["_"], [])

    def _parse_gtid_dump(self, cmd: bytes) -> dict:
        off = 1
        flags, sid = struct.unpack_from("<HI", cmd, off)
        off += 6
        name_len = struct.unpack_from("<I", cmd, off)[0]
        off += 4
        fname = cmd[off : off + name_len].decode()
        off += name_len
        pos = struct.unpack_from("<Q", cmd, off)[0]
        off += 8
        data_len = struct.unpack_from("<I", cmd, off)[0]
        off += 4
        blob = cmd[off : off + data_len]
        # decode the sid block back to canonical text for assertions
        n_sids = struct.unpack_from("<Q", blob, 0)[0]
        b = 8
        parts = []
        for _ in range(n_sids):
            raw = blob[b : b + 16].hex()
            uuid = (
                f"{raw[0:8]}-{raw[8:12]}-{raw[12:16]}-"
                f"{raw[16:20]}-{raw[20:32]}"
            )
            b += 16
            n_ivl = struct.unpack_from("<Q", blob, b)[0]
            b += 8
            ivls = []
            for _ in range(n_ivl):
                lo, hi = struct.unpack_from("<QQ", blob, b)
                b += 16
                ivls.append(f"{lo}" if hi == lo + 1 else f"{lo}-{hi - 1}")
            parts.append(uuid + ":" + ":".join(ivls))
        return {
            "file": fname,
            "pos": pos,
            "server_id": sid,
            "flags": flags,
            "auto_position": ",".join(parts),
        }

    def _serve_dump(self, sock, request: dict):
        with self._lock:
            plan = (
                self.dump_plans[self._dump_count]
                if self._dump_count < len(self.dump_plans)
                else {}
            )
            self._dump_count += 1
        request["plan"] = dict(plan)
        self.dump_requests.append(request)
        if "err" in plan:
            code, msg = plan["err"]
            self._err(sock, 1, code, msg)
            return
        send: list[tuple[str, int, bytes]] = []
        if "auto_position" in request:
            key = request["auto_position"]
            if key in self.gtid_serve_from:
                send = self.script.events[self.gtid_serve_from[key] :]
            else:
                send = list(self.script.events)
        else:
            fname, pos = request["file"], request["pos"]
            # a real dump announces the file with an artificial rotate,
            # replays the target file's FDE regardless of the requested
            # offset, then streams events past the offset and every
            # later file in full
            art = BinlogScript(file=fname, checksum=self.script.checksum)
            art.events = []
            art.add_rotate(fname, artificial=True)
            send.extend(art.events)
            for f, p, data in self.script.events:
                if f < fname:
                    continue
                is_fde = data[4] == FORMAT_DESCRIPTION_EVENT
                if f == fname and p <= pos and not is_fde:
                    continue
                send.append((f, p, data))
        seq = 1
        sent = 0
        for _f, _p, data in send:
            if plan.get("disconnect_after") is not None and sent >= plan[
                "disconnect_after"
            ]:
                sock.close()
                return
            send_packet(sock, seq, b"\x00" + data)
            seq = (seq + 1) & 0xFF
            sent += 1
        self._eof(sock, seq)
        # leave the socket open briefly; client closes after EOF
