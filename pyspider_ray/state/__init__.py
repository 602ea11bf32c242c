from .clock import VirtualClock, SequenceSource
from .token_bucket import TokenBucket
from .task_queue import QueueEntry, MergingHeap, TaskQueue
from .cuckoo import CuckooFilter
from .frontier import FrontierShard, ProjectConfig
from .coordinator import Coordinator, ProjectRuntime

__all__ = [
    "VirtualClock",
    "SequenceSource",
    "TokenBucket",
    "QueueEntry",
    "MergingHeap",
    "TaskQueue",
    "CuckooFilter",
    "FrontierShard",
    "ProjectConfig",
    "Coordinator",
    "ProjectRuntime",
]
