"""pyro low-latency streaming protocol (wire format of
video/pyro_protocol.h; server flow video/pyro_server.cpp).

Wire-compatible subset: message magic/typing (PYRO_MAKE_MESSAGE_TYPE
with the version mask), the TCP handshake (HELLO -> COOKIE -> UDP
cookie ack -> KICK -> CODEC_PARAMETERS), UDP payload packetization with
packet/subpacket sequence fields, BEGIN/KEY-FRAME/stream-type flag
bits, and client-side reassembly + progress accounting.  FEC blocks are
parsed but not generated (noted gap).
"""

from __future__ import annotations

import socket
import struct
import threading
from dataclasses import dataclass, field
from typing import Optional

PYRO_VERSION_MASK = 0xAA02 << 16
PYRO_MAX_PAYLOAD_SIZE = 1024


def make_message_type(t: int, size: int) -> int:
    v = ((ord("P") << 26) | (ord("Y") << 20) | (ord("R") << 14)
         | t | (size << 6)) & 0xFFFFFFFF          # C uint32 semantics
    return v ^ PYRO_VERSION_MASK


MESSAGE_MAGIC_MASK = (0xFFFFFFFF << 14) & 0xFFFFFFFF

MSG_OK = make_message_type(0, 0)
MSG_NAK = make_message_type(1, 0)
MSG_AGAIN = make_message_type(2, 0)
MSG_HELLO = make_message_type(3, 0)
MSG_COOKIE = make_message_type(4, 8)
MSG_KICK = make_message_type(5, 4)
MSG_PROGRESS = make_message_type(6, 40)
MSG_CODEC_PARAMETERS = make_message_type(7, 24)
MSG_PHASE_OFFSET = make_message_type(8, 4)
MSG_GAMEPAD_STATE = make_message_type(9, 16)
MSG_PING = make_message_type(10, 2)

VIDEO_CODEC_NONE = 0
VIDEO_CODEC_H264 = 1
VIDEO_CODEC_H265 = 2
VIDEO_CODEC_AV1 = 3
VIDEO_CODEC_PYROWAVE = 4

KICK_VIDEO_BIT = 1 << 0
KICK_AUDIO_BIT = 1 << 1

PAYLOAD_KEY_FRAME_BIT = 1 << 0
PAYLOAD_STREAM_TYPE_BIT = 1 << 1
PAYLOAD_PACKET_FEC_BIT = 1 << 2
PAYLOAD_PACKET_BEGIN_BIT = 1 << 3
PACKET_SEQ_OFFSET = 4
PACKET_SEQ_BITS = 14
SUBPACKET_SEQ_OFFSET = 18
SUBPACKET_SEQ_BITS = 14
PACKET_SEQ_MASK = (1 << PACKET_SEQ_BITS) - 1
SUBPACKET_SEQ_MASK = (1 << SUBPACKET_SEQ_BITS) - 1


def validate_magic(v: int) -> bool:
    return make_message_type(0, 0) == (v & MESSAGE_MAGIC_MASK)


def message_length(v: int) -> int:
    return (v >> 6) & 0xFF


@dataclass
class CodecParameters:
    """struct pyro_codec_parameters (little-endian wire layout)."""
    video_codec: int = VIDEO_CODEC_NONE
    video_color_profile: int = 0
    audio_codec: int = 0
    frame_rate_num: int = 60
    frame_rate_den: int = 1
    width: int = 0
    height: int = 0
    channels: int = 0
    rate: int = 0

    _FMT = "<iiiHHHHII"

    def pack(self) -> bytes:
        return struct.pack(self._FMT, self.video_codec,
                           self.video_color_profile, self.audio_codec,
                           self.frame_rate_num, self.frame_rate_den,
                           self.width, self.height, self.channels,
                           self.rate)

    @classmethod
    def unpack(cls, b: bytes) -> "CodecParameters":
        vals = struct.unpack(cls._FMT, b[:struct.calcsize(cls._FMT)])
        return cls(*vals)


def payload_flags(packet_seq: int, subpacket_seq: int, begin: bool,
                  key_frame: bool, is_audio: bool = False) -> int:
    f = 0
    if key_frame:
        f |= PAYLOAD_KEY_FRAME_BIT
    if is_audio:
        f |= PAYLOAD_STREAM_TYPE_BIT
    if begin:
        f |= PAYLOAD_PACKET_BEGIN_BIT
    f |= (packet_seq & PACKET_SEQ_MASK) << PACKET_SEQ_OFFSET
    f |= (subpacket_seq & SUBPACKET_SEQ_MASK) << SUBPACKET_SEQ_OFFSET
    return f


def packetize(frame: bytes, packet_seq: int, key_frame: bool) -> list:
    """Split one encoded frame into UDP datagrams (payload header +
    <=PYRO_MAX_PAYLOAD_SIZE chunks)."""
    out = []
    n = max(1, (len(frame) + PYRO_MAX_PAYLOAD_SIZE - 1)
            // PYRO_MAX_PAYLOAD_SIZE)
    for i in range(n):
        chunk = frame[i * PYRO_MAX_PAYLOAD_SIZE:
                      (i + 1) * PYRO_MAX_PAYLOAD_SIZE]
        flags = payload_flags(packet_seq, i, begin=(i == 0),
                              key_frame=key_frame)
        out.append(struct.pack("<I", flags) + chunk)
    return out


@dataclass
class Reassembler:
    """Client-side packet reassembly + pyro_progress_report stats."""
    total_received_packets: int = 0
    total_dropped_video_packets: int = 0
    total_received_key_frames: int = 0
    _cur_seq: int = -1
    _parts: dict = field(default_factory=dict)
    _key: bool = False

    def feed(self, datagram: bytes) -> Optional[bytes]:
        """Returns a completed frame when the next BEGIN arrives."""
        (flags,) = struct.unpack_from("<I", datagram)
        data = datagram[4:]
        self.total_received_packets += 1
        if flags & PAYLOAD_PACKET_FEC_BIT:
            return None                    # FEC decode not implemented
        pseq = (flags >> PACKET_SEQ_OFFSET) & PACKET_SEQ_MASK
        sseq = (flags >> SUBPACKET_SEQ_OFFSET) & SUBPACKET_SEQ_MASK
        done = None
        if flags & PAYLOAD_PACKET_BEGIN_BIT:
            done = self._complete()
            self._cur_seq = pseq
            self._parts = {}
            self._key = bool(flags & PAYLOAD_KEY_FRAME_BIT)
        if pseq != self._cur_seq:
            self.total_dropped_video_packets += 1
            return done
        self._parts[sseq] = data
        return done

    def flush(self) -> Optional[bytes]:
        return self._complete()

    def _complete(self) -> Optional[bytes]:
        if self._cur_seq < 0 or not self._parts:
            return None
        n = max(self._parts) + 1
        if any(i not in self._parts for i in range(n)):
            self.total_dropped_video_packets += 1
            return None
        if self._key:
            self.total_received_key_frames += 1
        out = b"".join(self._parts[i] for i in range(n))
        self._parts = {}
        return out

    def progress_report(self) -> bytes:
        return struct.pack("<QQQQQ", self.total_received_packets, 0,
                           self.total_dropped_video_packets, 0,
                           self.total_received_key_frames)


class PyroServer:
    """Minimal pyro server: TCP handshake + UDP frame streaming
    (video/pyro_server.cpp flow)."""

    def __init__(self, codec: CodecParameters, host="127.0.0.1"):
        self.codec = codec
        self._tcp = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._tcp.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._tcp.bind((host, 0))
        self._tcp.listen(1)
        self._udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._udp.bind((host, 0))
        self.tcp_port = self._tcp.getsockname()[1]
        self.udp_port = self._udp.getsockname()[1]
        self._cookie = 0xC0FFEE0012345678
        self._client_addr = None
        self._packet_seq = 0
        self._thread = None

    def serve_handshake(self) -> None:
        """Handle one client handshake on a background thread."""
        def run():
            conn, _ = self._tcp.accept()
            with conn:
                while True:
                    hdr = conn.recv(4)
                    if len(hdr) < 4:
                        return
                    (mtype,) = struct.unpack("<I", hdr)
                    if not validate_magic(mtype):
                        conn.sendall(struct.pack("<I", MSG_NAK))
                        return
                    body = conn.recv(message_length(mtype)) \
                        if message_length(mtype) else b""
                    if mtype == MSG_HELLO:
                        conn.sendall(struct.pack("<IQ", MSG_COOKIE,
                                                 self._cookie))
                        # wait for the UDP cookie ack
                        data, addr = self._udp.recvfrom(64)
                        if len(data) >= 8 and struct.unpack(
                                "<Q", data[:8])[0] == self._cookie:
                            self._client_addr = addr
                    elif mtype == MSG_KICK:
                        if self._client_addr is None:
                            conn.sendall(struct.pack("<I", MSG_NAK))
                        else:
                            conn.sendall(struct.pack(
                                "<I", MSG_CODEC_PARAMETERS)
                                + self.codec.pack())
                            return
                    elif mtype == MSG_PROGRESS:
                        pass
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def send_frame(self, frame: bytes, key_frame: bool = False) -> None:
        assert self._client_addr is not None
        for dg in packetize(frame, self._packet_seq, key_frame):
            self._udp.sendto(dg, self._client_addr)
        self._packet_seq = (self._packet_seq + 1) & PACKET_SEQ_MASK

    def close(self):
        self._tcp.close()
        self._udp.close()


class PyroClient:
    def __init__(self, host: str, tcp_port: int, udp_port: int):
        self._tcp = socket.create_connection((host, tcp_port), timeout=5)
        self._udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._udp.bind((host, 0))
        self._server_udp = (host, udp_port)
        self.reassembler = Reassembler()
        self.codec: Optional[CodecParameters] = None

    def handshake(self) -> CodecParameters:
        self._tcp.sendall(struct.pack("<I", MSG_HELLO))
        hdr = self._tcp.recv(4)
        (mtype,) = struct.unpack("<I", hdr)
        assert mtype == MSG_COOKIE, hex(mtype)
        (cookie,) = struct.unpack("<Q", self._tcp.recv(8))
        self._udp.sendto(struct.pack("<Q", cookie), self._server_udp)
        self._tcp.sendall(struct.pack("<II", MSG_KICK, KICK_VIDEO_BIT))
        (mtype,) = struct.unpack("<I", self._tcp.recv(4))
        assert mtype == MSG_CODEC_PARAMETERS, hex(mtype)
        self.codec = CodecParameters.unpack(self._tcp.recv(64))
        return self.codec

    def recv_frame(self, timeout: float = 2.0) -> Optional[bytes]:
        self._udp.settimeout(timeout)
        while True:
            data, _ = self._udp.recvfrom(PYRO_MAX_PAYLOAD_SIZE + 16)
            frame = self.reassembler.feed(data)
            if frame is not None:
                return frame

    def close(self):
        self._tcp.close()
        self._udp.close()
