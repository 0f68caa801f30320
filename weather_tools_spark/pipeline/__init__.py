"""Pipeline surface (weather-dl / weather-sp parity): partition
fan-out, manifest state store, partitioned file splitting, rate-limited
external I/O."""
