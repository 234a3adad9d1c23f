from dynseg.sched.scheduler import ScaleScheduler  # noqa: F401
