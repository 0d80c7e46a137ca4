"""Real UDP-multicast Bus implementing the same interface as comm.LossyBus.

Wire format per datagram: ``!IHH`` header (sender_id, channel_id, payload
length) + pickled payload (the packet dataclasses from swarm.comm). For
deployment the pickle layer would be swapped for the fixed-point MAVLink-ish
encodings; the channel/packet semantics are identical either way.

Default endpoint matches the reference's LCM URL udpm://224.0.0.251:7667
(loop_net.cpp:4-17).
"""
from __future__ import annotations

import ctypes
import pickle
import struct
from typing import Callable, Dict, List, Tuple

from omniswarm_tpu.runtime.native import _load

DEFAULT_GROUP = "224.0.0.251"
DEFAULT_PORT = 7667
_HDR = struct.Struct("!IHH")
_CHANNELS: List[str] = [
    "SWARM_LOOP_IMG_DES", "SWARM_LOOP_CONN", "VIOKF_HEADER",
    "VIOKF_LANDMARKS", "LOOP_INLIERS",
]


def _lib():
    lib = _load("udp_multicast", ["udp_multicast.cpp"])
    if lib is None:
        raise RuntimeError("native udp_multicast library unavailable")
    lib.umc_open.restype = ctypes.c_int
    lib.umc_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int]
    lib.umc_send.restype = ctypes.c_int
    lib.umc_send.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                             ctypes.c_char_p, ctypes.c_int]
    lib.umc_recv.restype = ctypes.c_int
    lib.umc_recv.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
    lib.umc_close.argtypes = [ctypes.c_int]
    return lib


class UdpMulticastBus:
    """LossyBus-compatible transport over real multicast datagrams.

    Each participating process creates one bus; ``step()`` drains the socket
    and dispatches to subscribers. Loss/latency come from the real network.
    """

    def __init__(self, group: str = DEFAULT_GROUP, port: int = DEFAULT_PORT,
                 ttl: int = 1, loopback: bool = True):
        self._lib = _lib()
        self.group = group.encode()
        self.port = port
        fd = self._lib.umc_open(self.group, port, ttl, int(loopback))
        if fd < 0:
            raise OSError(-fd, "umc_open failed")
        self._fd = fd
        self._subs: Dict[str, List[Tuple[int, Callable]]] = {}
        self._buf = ctypes.create_string_buffer(65536)
        self.bytes_sent: Dict[str, int] = {}

    def subscribe(self, peer_id: int, channel: str, cb: Callable) -> None:
        self._subs.setdefault(channel, []).append((peer_id, cb))

    def publish(self, sender_id: int, channel: str, msg, t: float = 0.0) -> None:
        payload = pickle.dumps(msg, protocol=4)
        cid = _CHANNELS.index(channel) if channel in _CHANNELS else 0xFFFF
        pkt = _HDR.pack(sender_id, cid, min(len(payload), 0xFFFF)) + payload
        n = self._lib.umc_send(self._fd, self.group, self.port, pkt, len(pkt))
        if n < 0:
            raise OSError(-n, "umc_send failed")
        self.bytes_sent[channel] = self.bytes_sent.get(channel, 0) + len(pkt)

    def step(self, t: float = 0.0) -> int:
        delivered = 0
        while True:
            n = self._lib.umc_recv(self._fd, self._buf, 65536)
            if n == 0:
                break
            if n < 0:
                raise OSError(-n, "umc_recv failed")
            raw = self._buf.raw[:n]
            sender_id, cid, _plen = _HDR.unpack_from(raw)
            payload = raw[_HDR.size:]
            channel = _CHANNELS[cid] if cid < len(_CHANNELS) else "?"
            msg = pickle.loads(payload)
            for pid, cb in self._subs.get(channel, []):
                if pid != sender_id:
                    cb(msg)
                    delivered += 1
        return delivered

    def close(self) -> None:
        self._lib.umc_close(self._fd)
