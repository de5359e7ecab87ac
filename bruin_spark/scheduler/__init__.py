from bruin_spark.scheduler.scheduler import (
    InstanceStatus,
    InstanceType,
    PipelineState,
    RunResult,
    Scheduler,
    TaskInstance,
)

__all__ = [
    "InstanceStatus",
    "InstanceType",
    "PipelineState",
    "RunResult",
    "Scheduler",
    "TaskInstance",
]
