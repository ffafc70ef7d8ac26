from . import batching, profiling, task_cache
