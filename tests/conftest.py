import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """Initialise Ray ONCE per pytest session (driver contract: tests own
    their Ray lifecycle; library code never calls ray.init)."""
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    from wtes_ray.ops.runtime import quiet_empty_schema_warnings

    quiet_empty_schema_warnings()

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()
