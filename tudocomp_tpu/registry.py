"""Algorithm registry: id-string -> class -> instance.

Mirror of include/tudocomp/Registry.hpp:11-238 and
include/tudocomp/CreateAlgorithm.hpp (create_algo/builder): maps (type, name)
to algorithm classes, selects & instantiates from id strings, enumerates all
static combinations for the conformance matrix, and generates --list docs.
"""

from __future__ import annotations

from typing import Iterable, Optional, Type

from .dsl import evaluate, parse
from .meta import Algorithm, AlgorithmValue, Env, Meta


class Registry:
    def __init__(self):
        # (type, name) -> class
        self._algos: dict[tuple[str, str], Type[Algorithm]] = {}

    # -- registration --------------------------------------------------------

    def register(self, cls: Type[Algorithm]) -> Type[Algorithm]:
        meta = cls.meta()
        key = (meta.type, meta.name)
        self._algos[key] = cls
        return cls

    # -- lookup ---------------------------------------------------------------

    def get_class(self, algo_type: str, name: str) -> Type[Algorithm]:
        key = (algo_type, name)
        if key not in self._algos:
            raise KeyError(f"no {algo_type} algorithm named {name!r} registered")
        return self._algos[key]

    def find_class(self, name: str) -> Type[Algorithm]:
        """Find a class by id name across all types (unique names assumed)."""
        for (t, n), cls in self._algos.items():
            if n == name:
                return cls
        raise KeyError(f"no algorithm named {name!r} registered")

    def names(self, algo_type: str) -> list[str]:
        return sorted(n for (t, n) in self._algos if t == algo_type)

    def types(self) -> list[str]:
        return sorted({t for (t, n) in self._algos})

    # -- selection -----------------------------------------------------------

    def parse_algorithm_id(self, id_string: str, algo_type: str = "compressor") -> AlgorithmValue:
        return evaluate(parse(id_string), algo_type, self)

    def select(self, id_string: str, algo_type: str = "compressor") -> Algorithm:
        """Parse an id string and instantiate the algorithm (Registry.hpp:204-238)."""
        av = self.parse_algorithm_id(id_string, algo_type)
        return self.select_algorithm(av, algo_type)

    def select_algorithm(self, av: AlgorithmValue, algo_type: str = "compressor") -> Algorithm:
        cls = self.get_class(algo_type, av.name)
        return cls(Env(self, av))

    # -- static enumeration (conformance matrix) -------------------------------

    def all_algorithms_with_static(
        self, algo_type: str, depth: int = 0, max_depth: int = 3
    ) -> list[str]:
        """Enumerate every static combination as an id string.

        Mirror of Registry::all_algorithms_with_static (Registry.hpp:40-75),
        including the per-type recursion cap at depth 3 (Registry.hpp:60-63).
        """
        if depth > max_depth:
            return []
        out: list[str] = []
        for name in self.names(algo_type):
            cls = self.get_class(algo_type, name)
            meta = cls.meta()
            if any(
                d.kind == "dynamic_compressor" and d.default is None
                for d in meta.options.values()
            ):
                # not statically instantiable (chain/blockwise need a
                # runtime-dispatched compressor argument)
                continue
            templated = [
                d for d in meta.options.values() if d.kind == "templated"
            ]
            if not templated:
                out.append(name)
                continue
            choice_lists: list[list[str]] = []
            ok = True
            for d in templated:
                subs = self.all_algorithms_with_static(
                    d.algo_type, depth + 1, max_depth
                )
                if not subs:
                    ok = False
                    break
                choice_lists.append(subs)
            if not ok:
                continue
            combos: list[list[str]] = [[]]
            for cl in choice_lists:
                combos = [c + [s] for c in combos for s in cl]
            for combo in combos:
                args = ", ".join(
                    f"{d.name}={s}" for d, s in zip(templated, combo)
                )
                out.append(f"{name}({args})")
        return out

    # -- docs -----------------------------------------------------------------

    def generate_doc_string(self, algo_type: str = "compressor") -> str:
        lines = [f"[{algo_type}]"]
        for name in self.names(algo_type):
            meta = self.get_class(algo_type, name).meta()
            sig_parts = []
            for d in meta.options.values():
                if d.kind == "templated":
                    dflt = f" = {d.default}" if d.default else ""
                    sig_parts.append(f"{d.name}: {d.algo_type}{dflt}")
                elif d.kind == "dynamic_compressor":
                    sig_parts.append(f"{d.name}: compressor (dynamic)")
                else:
                    dflt = f" = {d.default}" if d.default is not None else ""
                    sig_parts.append(f"{d.name}: string{dflt}")
            sig = f"({', '.join(sig_parts)})" if sig_parts else ""
            doc = meta.doc.splitlines()[0] if meta.doc else ""
            lines.append(f"  {name}{sig}")
            if doc:
                lines.append(f"      {doc}")
        return "\n".join(lines)


# The global registry, analogous to COMPRESSOR_REGISTRY/GENERATOR_REGISTRY
# (include/tudocomp_driver/Registry.hpp:46-47). Populated by
# tudocomp_tpu.register_all() on package import.
REGISTRY = Registry()


def create_algo(cls_or_id, options: str = "", registry: Optional[Registry] = None):
    """Instantiate an algorithm directly with an options string.

    Mirror of create_algo<T>(options) (include/tudocomp/CreateAlgorithm.hpp:118):
    used by library users and tests.
    """
    reg = registry or REGISTRY
    if isinstance(cls_or_id, str):
        id_string = cls_or_id
        meta_type = "compressor"
        try:
            ast = parse(id_string)
            meta_type = reg.find_class(ast.name).meta().type
        except KeyError:
            pass
        return reg.select(id_string, meta_type)
    cls = cls_or_id
    meta: Meta = cls.meta()
    id_string = f"{meta.name}({options})" if options else meta.name
    av = evaluate(parse(id_string), meta.type, reg)
    return cls(Env(reg, av))
