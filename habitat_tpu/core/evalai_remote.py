"""EvalAI remote-evaluation gRPC protocol (reference core/benchmark.py:43-121).

The reference's `remote_evaluate` speaks to a challenge-side environment
server through an `evaluation.Environment` gRPC service whose six unary
methods all exchange one message type::

    message Package { bytes SerializedEntity = 1; }

with pickled python dicts inside (the habitat-challenge protocol —
`pack_for_grpc`/`unpack_for_grpc` in the reference). The generated
evaluation_pb2 modules live in the challenge image, not the repo, so here
the Package codec is hand-written (single bytes field = tag 0x0A + varint
length + payload) and the service is registered through grpc generic
handlers — wire-compatible with the reference client/server without
protoc.

Both halves are implemented:
- :func:`serve_env` — the CHALLENGE side: hosts any `habitat_tpu.core.env.Env`
  behind the service (num_episodes / reset / episode_over /
  act_on_environment / get_metrics / evalai_update_submission).
- :class:`EnvironmentStub` — the SUBMISSION side, used by
  `Benchmark.remote_evaluate`.

The zero-egress image cannot reach the real evalai server; the protocol is
exercised end-to-end over localhost in tests/test_evalai_remote.py
(server hosting a real env, client driving it through the full loop).

NOTE: SerializedEntity carries pickle by protocol definition (the
reference's choice). Unpickling runs only on operator-configured
endpoints (EVALENV_ADDPORT, default localhost) — do not point it at an
untrusted server.
"""

from __future__ import annotations

import pickle
from concurrent import futures
from typing import Any, Callable, Dict, Optional

SERVICE = "evaluation.Environment"
METHODS = (
    "num_episodes",
    "reset",
    "episode_over",
    "act_on_environment",
    "get_metrics",
    "evalai_update_submission",
)


# ---------------------------------------------------------------------------
# Package message codec (protobuf wire format, single bytes field #1)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def pack_package(payload: bytes) -> bytes:
    """Serialize Package{SerializedEntity=payload}. Empty field is omitted
    (proto3 default), giving the empty message b''."""
    if not payload:
        return b""
    return b"\x0a" + _varint(len(payload)) + payload


def unpack_package(msg: bytes) -> bytes:
    """Parse Package -> SerializedEntity bytes (b'' if absent)."""
    i = 0
    while i < len(msg):
        tag = msg[i]
        i += 1
        if tag != 0x0A:  # unknown field: only varint-length-delimited occurs
            raise ValueError(f"unexpected Package field tag {tag:#x}")
        ln = 0
        shift = 0
        while True:
            b = msg[i]
            i += 1
            ln |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return bytes(msg[i : i + ln])
    return b""


def pack_for_grpc(entity: Any) -> bytes:
    return pickle.dumps(entity)


def unpack_for_grpc(entity: bytes) -> Any:
    return pickle.loads(entity)


# ---------------------------------------------------------------------------
# Challenge-side server
# ---------------------------------------------------------------------------

class _EnvServicer:
    """Service implementation over a habitat_tpu Env (reference server
    semantics: reset returns observations; act_on_environment takes the
    pickled action and returns the post-step observations)."""

    def __init__(self, env):
        self.env = env
        self._obs = None

    def num_episodes(self, payload: bytes) -> Any:
        return {"num_episodes": len(self.env.episodes)}

    def reset(self, payload: bytes) -> Any:
        self._obs = self.env.reset()
        return {"observations": self._obs}

    def episode_over(self, payload: bytes) -> Any:
        return {"episode_over": bool(self.env.episode_over)}

    def act_on_environment(self, payload: bytes) -> Any:
        action = unpack_for_grpc(payload)
        self._obs = self.env.step(action)
        return {"observations": self._obs}

    def get_metrics(self, payload: bytes) -> Any:
        return {"metrics": self.env.get_metrics()}

    def evalai_update_submission(self, payload: bytes) -> Any:
        return {"ack": True}


def serve_env(env, address: str = "localhost:0"):
    """Host `env` behind the evaluation.Environment service.

    Returns (server, port). Caller stops with server.stop(None)."""
    import grpc

    servicer = _EnvServicer(env)

    def handler_for(name: str) -> Callable:
        method = getattr(servicer, name)

        def unary(request: bytes, context) -> bytes:
            result = method(unpack_package(request))
            return pack_package(pack_for_grpc(result))

        return unary

    import grpc as _grpc

    rpc_handlers = {
        name: _grpc.unary_unary_rpc_method_handler(
            handler_for(name),
            request_deserializer=lambda b: b,
            response_serializer=lambda b: b,
        )
        for name in METHODS
    }
    generic = _grpc.method_handlers_generic_handler(SERVICE, rpc_handlers)
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=2))
    server.add_generic_rpc_handlers((generic,))
    port = server.add_insecure_port(address)
    server.start()
    return server, port


# ---------------------------------------------------------------------------
# Submission-side stub
# ---------------------------------------------------------------------------

class EnvironmentStub:
    """Wire-compatible replacement for evaluation_pb2_grpc.EnvironmentStub +
    the Package wrapping: each method takes/returns a python object."""

    def __init__(self, channel):
        self._calls = {
            name: channel.unary_unary(
                f"/{SERVICE}/{name}",
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )
            for name in METHODS
        }

    def call(self, name: str, entity: Any = None) -> Any:
        payload = pack_for_grpc(entity) if entity is not None else b""
        resp = self._calls[name](pack_package(payload))
        return unpack_for_grpc(unpack_package(resp))
