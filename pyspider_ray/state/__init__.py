from .clock import VirtualClock, SequenceSource
from .token_bucket import TokenBucket
from .task_queue import QueueEntry, MergingHeap, TaskQueue

__all__ = [
    "VirtualClock",
    "SequenceSource",
    "TokenBucket",
    "QueueEntry",
    "MergingHeap",
    "TaskQueue",
]
