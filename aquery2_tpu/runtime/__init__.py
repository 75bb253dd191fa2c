"""Runtime services: triggers, stored procedures, statistics.

TPU-native counterparts of the reference's C++ runtime services
(server/threading.cpp trigger hosts, server.cpp stored-procedure
record/replay, Config phase timers) — re-designed as Python services
driving the same executor (SURVEY.md §7 "Runtime services")."""

from aquery2_tpu.runtime.stats import QueryStats
from aquery2_tpu.runtime.triggers import TriggerHost
from aquery2_tpu.runtime.procedures import ProcedureStore
