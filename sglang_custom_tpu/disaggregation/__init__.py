from sglang_custom_tpu.disaggregation.conn import (
    FakeKVTransfer,
    KVPayload,
    KVPoll,
    TCPKVReceiver,
    TCPKVSender,
)

__all__ = [
    "FakeKVTransfer", "KVPayload", "KVPoll", "TCPKVReceiver", "TCPKVSender",
]
