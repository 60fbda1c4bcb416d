"""Component registries: ``type:`` strings -> builder callables.

Mirrors the reference's builder-registry pattern (input registration
crates/arkflow-core/src/input/mod.rs:32-40, processors processor/mod.rs:91-105)
so YAML configs resolve components by name. Each builder takes
``(config: dict)`` and returns a component instance.
"""

from __future__ import annotations

from collections.abc import Callable


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._builders: dict[str, Callable] = {}

    def register(self, name: str):
        def deco(builder: Callable):
            self._builders[name] = builder
            return builder

        return deco

    def build(self, conf: dict):
        conf = dict(conf)
        type_name = conf.pop("type", None)
        if type_name is None:
            raise ValueError(f"{self.kind} config missing 'type': {conf}")
        if type_name not in self._builders:
            raise ValueError(
                f"unknown {self.kind} type '{type_name}'"
                f" (known: {sorted(self._builders)})"
            )
        return self._builders[type_name](conf)

    def known(self) -> list[str]:
        return sorted(self._builders)


INPUTS = Registry("input")
PROCESSORS = Registry("processor")
BUFFERS = Registry("buffer")
OUTPUTS = Registry("output")
CODECS = Registry("codec")
TEMPORARIES = Registry("temporary")


def load_all() -> None:
    """Import every component module so registrations run."""
    from arkflow_spark import codecs as _c  # noqa: F401
    from arkflow_spark import operators as _p  # noqa: F401
    from arkflow_spark import sinks as _o  # noqa: F401
    from arkflow_spark import sources as _i  # noqa: F401
    from arkflow_spark import temporary as _t  # noqa: F401
    from arkflow_spark.streaming import buffers as _b  # noqa: F401
