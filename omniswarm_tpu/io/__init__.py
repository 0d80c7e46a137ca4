from omniswarm_tpu.io.flightlog import (  # noqa: F401
    FlightLog,
    parse_flight_csv,
    replay_dataset,
    resample,
)
