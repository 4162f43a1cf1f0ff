from uurg_tpu.utils.profiling import StepTimer, timed, trace
