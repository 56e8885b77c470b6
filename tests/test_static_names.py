"""Static undefined-name gate for the whole source tree.

No lint tool ships in this environment, and the bug class this closes is
invisible to every test tier by construction: a name referenced only inside a
backend-gated branch (TPU-only recovery, tunnel-only error handling) that no
CPU test can ever execute. Round 4 shipped exactly that —
`trainer/train_step.py` used `logger.warning` in the relayout
straggler-recovery path without ever binding `logger`, and the resulting
NameError nulled the flagship 20B Qwen bench number (BENCH_r04.json).

The checker is deliberately an UNDER-approximation: a module passes if every
name it loads is bound SOMEWHERE in the file (any scope), an import, a
builtin, or a module-implicit dunder. That misses scope-violation bugs but
has essentially zero false positives, which is what lets it run as a hard
gate in the fast tier.
"""

import ast
import builtins
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SOURCE_ROOTS = [REPO / "qflux_tpu", REPO / "scripts"]
EXTRA_FILES = [REPO / "bench.py", REPO / "__graft_entry__.py", REPO / "main.py"]

#: names every module gets without binding them
IMPLICIT = {
    "__name__", "__file__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__path__", "__class__",
    "__annotations__", "__dict__", "__module__", "__qualname__",
}
BUILTINS = set(dir(builtins))


def _bound_names(tree: ast.AST) -> set:
    """Every name bound anywhere in the file, in any scope."""
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
            names.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.arg):
            names.add(node.arg)
        elif isinstance(node, ast.alias):
            names.add((node.asname or node.name).split(".")[0])
        elif isinstance(node, ast.ExceptHandler) and node.name:
            names.add(node.name)
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            names.update(node.names)
        elif isinstance(node, (ast.MatchAs, ast.MatchStar)) and node.name:
            names.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            names.add(node.rest)
    return names


def _loaded_names(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            yield node.id, node.lineno


def undefined_names(source: str, filename: str = "<mod>") -> list:
    """[(name, lineno)] loaded but never bound anywhere in the module."""
    tree = ast.parse(source, filename=filename)
    bound = _bound_names(tree) | IMPLICIT | BUILTINS
    seen, out = set(), []
    for name, lineno in _loaded_names(tree):
        if name not in bound and (name, lineno) not in seen:
            seen.add((name, lineno))
            out.append((name, lineno))
    return out


def _all_source_files():
    files = list(EXTRA_FILES)
    for root in SOURCE_ROOTS:
        files.extend(sorted(root.rglob("*.py")))
    return [f for f in files if f.exists()]


@pytest.mark.parametrize(
    "path", _all_source_files(), ids=lambda p: str(p.relative_to(REPO)))
def test_no_undefined_names(path):
    bad = undefined_names(path.read_text(), str(path))
    assert not bad, (
        f"{path.relative_to(REPO)} loads names never bound in the module "
        f"(NameError at runtime in any branch that reaches them): "
        + ", ".join(f"{n} (line {ln})" for n, ln in bad)
    )


def test_checker_catches_the_round4_bug():
    """Self-test on the exact shape of the round-4 regression: a module that
    calls `logger.warning` without binding `logger` must be flagged."""
    src = (
        "import jax\n"
        "def relayout(out, fmts):\n"
        "    for i, f in enumerate(fmts):\n"
        "        if getattr(out[i], 'format', None) != f:\n"
        "            logger.warning('straggler %d', i)\n"
        "            out[i] = jax.device_put(out[i], f)\n"
        "    return out\n"
    )
    assert undefined_names(src) == [("logger", 5)]


def test_checker_accepts_legitimate_constructs():
    """No false positives on the constructs the source tree actually uses:
    comprehension targets, walrus, except-as, global, lambda args, match."""
    src = (
        "import logging\n"
        "logger = logging.getLogger(__name__)\n"
        "xs = [y * y for y in range(3)]\n"
        "if (n := len(xs)) > 1:\n"
        "    logger.info('%d', n)\n"
        "try:\n"
        "    pass\n"
        "except ValueError as e:\n"
        "    logger.error('%s', e)\n"
        "f = lambda a, *b, **c: (a, b, c)\n"
        "def g():\n"
        "    global xs\n"
        "    xs = []\n"
        "match xs:\n"
        "    case [head, *tail]:\n"
        "        logger.info('%s %s', head, tail)\n"
        "    case {**rest}:\n"
        "        logger.info('%s', rest)\n"
    )
    assert undefined_names(src) == []
