"""C-ABI drift check: native/raytracer_tpu.h is the single source of truth.

The reference generates its header from the Rust source with cbindgen
(build.rs:8-22), so the ABI can never drift.  Here the C++ engine includes
the header (compiler-enforced), and this test enforces the remaining edge:
every struct layout and function signature declared in ``native.py``'s
ctypes bindings must match what the header declares.  Any of the three
copies changing without the others fails CI.
"""

import ctypes
import os
import re

import pytest

from raytracer_tpu import native

HEADER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "raytracer_tpu.h")

# C type -> ctypes type (by-value cases; pointers handled structurally)
SCALAR = {
    "uint8_t": ctypes.c_uint8,
    "uint32_t": ctypes.c_uint32,
    "int32_t": ctypes.c_int32,
    "int": ctypes.c_int,
    "size_t": ctypes.c_size_t,
    "float": ctypes.c_float,
    "void": None,
}
STRUCTS = {
    "RtColorU8": native.RtColorU8,
    "RtFramebuffer": native.RtFramebuffer,
    "RtRenderOptions": native.RtRenderOptions,
}


def _strip_comments(src: str) -> str:
    src = re.sub(r"/\*.*?\*/", " ", src, flags=re.S)
    return re.sub(r"//[^\n]*", " ", src)


@pytest.fixture(scope="module")
def header_src():
    with open(HEADER) as f:
        return _strip_comments(f.read())


def _ctype_for(decl: str):
    """ctypes type for one C declarator (type part only, no name)."""
    decl = decl.replace("const", " ").strip()
    ptr = decl.count("*")
    base = decl.replace("*", " ").split()[0]
    if ptr == 0:
        if base in SCALAR:
            return SCALAR[base]
        return STRUCTS[base]
    assert ptr == 1, f"multi-level pointer unsupported: {decl}"
    if base == "char":
        return ctypes.c_char_p
    if base == "RtWorldHandle":
        return ctypes.c_void_p  # opaque
    if base in STRUCTS:
        return ctypes.POINTER(STRUCTS[base])
    raise AssertionError(f"unhandled pointer type {decl}")


def _parse_functions(src: str):
    """{name: (restype, [argtypes])} for every rt_* declaration."""
    out = {}
    for m in re.finditer(
            r"([A-Za-z_][\w ]*\*?)\s*(rt_\w+)\s*\(([^;]*?)\)\s*;", src):
        ret, name, args = m.group(1).strip(), m.group(2), m.group(3)
        argtypes = []
        args = " ".join(args.split())
        if args not in ("", "void"):
            for a in args.split(","):
                a = a.strip()
                arr = re.search(r"\[(\d+)\]\s*$", a)
                if arr:  # e.g. "float out_xyz[3]"
                    n = int(arr.group(1))
                    base = a[:arr.start()].split()[0]
                    argtypes.append(SCALAR[base] * n)
                    continue
                # drop the trailing identifier if present
                toks = a.replace("*", " * ").split()
                if toks[-1] not in ("*",) and not toks[-1].endswith("_t") \
                        and toks[-1] not in SCALAR and toks[-1] not in STRUCTS:
                    toks = toks[:-1]
                argtypes.append(_ctype_for(" ".join(toks)))
        out[name] = (_ctype_for(ret), argtypes)
    return out


def _parse_struct_fields(src: str, name: str):
    """[(ctype, fieldname), ...] from the header's struct definition."""
    m = re.search(r"typedef struct %s\s*\{(.*?)\}\s*%s\s*;" % (name, name),
                  src, flags=re.S)
    assert m, f"struct {name} not found in header"
    fields = []
    for line in m.group(1).split(";"):
        line = " ".join(line.split())
        if not line:
            continue
        toks = line.replace("*", " * ").split()
        # "uint8_t r , g , b , a" style multi-declarators
        typ_end = 1
        while toks[typ_end] == "*":
            typ_end += 1
        typ = _ctype_for(" ".join(toks[:typ_end]))
        for ident in " ".join(toks[typ_end:]).split(","):
            fields.append((ident.strip(), typ))
    return fields


class TestStructLayouts:
    @pytest.mark.parametrize("name", sorted(STRUCTS))
    def test_fields_match_header(self, header_src, name):
        declared = _parse_struct_fields(header_src, name)
        bound = [(f, t) for f, t in STRUCTS[name]._fields_]
        assert bound == declared, (
            f"{name}: ctypes fields {bound} != header fields {declared}")


class TestFunctionSignatures:
    def test_every_header_function_checked(self, header_src):
        fns = _parse_functions(header_src)
        # the full exported surface, so a new export must be bound + tested
        assert sorted(fns) == [
            "rt_camera_position", "rt_destroy_world", "rt_last_error",
            "rt_load_world", "rt_load_world_n", "rt_move_camera_position",
            "rt_render", "rt_version", "rt_write_ppm"]

    def test_ctypes_bindings_match_header(self, header_src):
        try:
            lib = native.load_library()
        except native.NativeUnavailable as e:
            pytest.skip(f"native library unavailable: {e}")
        fns = _parse_functions(header_src)
        for name, (ret, argtypes) in fns.items():
            fn = getattr(lib, name)
            bound_args = list(fn.argtypes or [])
            # ctypes represents unset restype as c_int (C default int)
            bound_ret = fn.restype
            want_ret = ctypes.c_int if ret is None else ret
            if bound_ret is None:
                bound_ret = None if ret is None else bound_ret
            if ret is None:
                assert fn.restype in (None, ctypes.c_int), name
            else:
                assert _same_type(fn.restype, ret), (
                    f"{name}: restype {fn.restype} != header {ret}")
            assert len(bound_args) == len(argtypes), (
                f"{name}: {len(bound_args)} bound args, header has "
                f"{len(argtypes)}")
            for i, (b, h) in enumerate(zip(bound_args, argtypes)):
                assert _same_type(b, h), (
                    f"{name} arg {i}: bound {b} != header {h}")


def _same_type(a, b):
    if a is b:
        return True
    # POINTER(X) creates distinct class objects per call: compare _type_
    at, bt = getattr(a, "_type_", None), getattr(b, "_type_", None)
    if at is not None and at is bt:
        # pointer-to-same and array-of-same: lengths must match for arrays
        return getattr(a, "_length_", None) == getattr(b, "_length_", None)
    # c_void_p for opaque handles: header says RtWorldHandle* -> c_void_p
    return a is ctypes.c_void_p and b is ctypes.c_void_p
