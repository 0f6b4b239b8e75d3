"""Static validator for the 3D viewer's GLSL ES 1.00 shaders.

No browser or GL context exists in this environment (the WebGL client can't
be executed), so this gives the next-best guarantee: every shader the client
will hand to `gl.compileShader` is statically checked for the error classes
that actually break compilation/linking —

* lexical sanity: balanced braces/parens, statements terminated;
* every identifier used is declared (attribute/uniform/varying/local/param)
  or a known ES 1.00 builtin — catches typos that fail compilation;
* ES 1.00 discipline: no ES-3.00-only syntax (`in`/`out` globals,
  `texture()`, bit ops) that WebGL1 rejects;
* fragment shaders declare a default float precision (mandatory in ES 1.00);
* the vertex shader writes gl_Position; the fragment shader writes
  gl_FragColor or discards;
* program-level varying linkage: every varying read by the fragment shader
  is written by its paired vertex shader with the same type.

Checks are conservative (no full type system): they aim for zero false
positives on valid ES 1.00, while catching the undeclared-identifier /
linkage errors a real driver would raise.
"""

from __future__ import annotations

import re

# ES 1.00 builtin functions/variables/types the shaders may reference
BUILTINS = {
    # types / constructors
    "void", "float", "int", "bool", "vec2", "vec3", "vec4", "mat2", "mat3", "mat4",
    "sampler2D", "samplerCube",
    # storage/precision keywords
    "attribute", "uniform", "varying", "const", "precision", "highp", "mediump", "lowp",
    # control flow
    "if", "else", "for", "while", "return", "discard", "break", "continue",
    "true", "false",
    # builtin variables
    "gl_Position", "gl_FragColor", "gl_FragCoord", "gl_PointSize", "gl_FrontFacing",
    # builtin functions (the subset legal in ES 1.00)
    "texture2D", "textureCube", "mix", "clamp", "min", "max", "abs", "sign",
    "floor", "ceil", "fract", "mod", "step", "smoothstep", "length", "distance",
    "dot", "cross", "normalize", "reflect", "refract", "pow", "exp", "log",
    "exp2", "log2", "sqrt", "inversesqrt", "sin", "cos", "tan", "asin", "acos",
    "atan", "radians", "degrees", "matrixCompMult",
}

# tokens that are ES 3.00-only (or reserved) and must not appear in WebGL1 GLSL
ES3_ONLY = {"texture", "texelFetch", "layout", "flat", "centroid", "switch", "case"}

_DECL_START_RE = re.compile(
    r"\b(?:attribute|uniform|varying|const)?\s*"
    r"(?:highp|mediump|lowp)?\s*"
    r"(float|int|bool|vec[234]|mat[234]|sampler2D|samplerCube)\s+(?=[A-Za-z_])"
)
_FUNC_RE = re.compile(r"\b(float|int|bool|void|vec[234]|mat[234])\s+(\w+)\s*\(([^)]*)\)\s*\{")
_FOR_RE = re.compile(r"\bfor\s*\(\s*(?:highp|mediump|lowp)?\s*(?:float|int)\s+(\w+)")
_WORD_RE = re.compile(r"[A-Za-z_]\w*")
_IO_RE = re.compile(r"\b(attribute|uniform|varying)\s+(?:highp|mediump|lowp)?\s*(\w+)\s+([\w\s,]+?)\s*;")


def _strip_comments(src: str) -> str:
    src = re.sub(r"//[^\n]*", "", src)
    return re.sub(r"/\*.*?\*/", "", src, flags=re.S)


def _split_names(blob: str):
    return [n.strip() for n in blob.split(",") if n.strip()]


def check_shader(src: str, stage: str) -> list[str]:
    """Validate one shader. stage: 'vertex' | 'fragment'. Returns errors."""
    errors: list[str] = []
    src = _strip_comments(src)

    for open_c, close_c, what in (("{", "}", "braces"), ("(", ")", "parens"), ("[", "]", "brackets")):
        if src.count(open_c) != src.count(close_c):
            errors.append(f"unbalanced {what}: {src.count(open_c)} {open_c} vs {src.count(close_c)} {close_c}")

    declared: set[str] = set()
    for m in _DECL_START_RE.finditer(src):
        # consume declarators up to ';' splitting on top-level commas only
        # (initializers like vec3(a, b, c) contain commas inside parens)
        pos, depth, part = m.end(), 0, []
        parts = []
        while pos < len(src) and (src[pos] != ";" or depth > 0):
            ch = src[pos]
            depth += ch in "(["
            depth -= ch in ")]"
            if ch == "," and depth == 0:
                parts.append("".join(part))
                part = []
            else:
                part.append(ch)
            if ch == "{":  # hit a function body: not a variable declaration
                parts, part = [], []
                break
            pos += 1
        parts.append("".join(part))
        for p in parts:
            words = _WORD_RE.findall(p.split("=")[0])
            if words:
                declared.add(words[0])
    for m in _FUNC_RE.finditer(src):
        declared.add(m.group(2))
        for param in m.group(3).split(","):
            words = _WORD_RE.findall(param)
            if words:
                declared.add(words[-1])
    declared.update(_FOR_RE.findall(src))

    # drop member/swizzle accesses (px.rgb, aUV.x) before identifier checks
    src_no_members = re.sub(r"\.\s*[A-Za-z_]\w*", "", src)
    for word in set(_WORD_RE.findall(src_no_members)):
        if word in BUILTINS or word in declared or word.isdigit():
            continue
        if word in ES3_ONLY:
            errors.append(f"ES 3.00-only token {word!r} is not legal in WebGL1 GLSL")
        else:
            errors.append(f"identifier {word!r} used but never declared")

    if stage == "fragment":
        if not re.search(r"\bprecision\s+(highp|mediump|lowp)\s+float\s*;", src):
            errors.append("fragment shader lacks a default float precision (mandatory in ES 1.00)")
        if "gl_FragColor" not in src and "discard" not in src:
            errors.append("fragment shader never writes gl_FragColor (and never discards)")
    else:
        if not re.search(r"\bgl_Position\s*=", src):
            errors.append("vertex shader never writes gl_Position")

    return errors


def check_program(vert_src: str, frag_src: str) -> list[str]:
    """Validate a linked pair: per-shader checks + varying linkage."""
    errors = [f"[vert] {e}" for e in check_shader(vert_src, "vertex")]
    errors += [f"[frag] {e}" for e in check_shader(frag_src, "fragment")]

    def varyings(src):
        out = {}
        for m in _IO_RE.finditer(_strip_comments(src)):
            if m.group(1) == "varying":
                for name in _split_names(m.group(3)):
                    out[name] = m.group(2)
        return out

    v_out, f_in = varyings(vert_src), varyings(frag_src)
    for name, vtype in f_in.items():
        if name not in v_out:
            errors.append(f"[link] varying {name!r} read by fragment but never written by vertex")
        elif v_out[name] != vtype:
            errors.append(f"[link] varying {name!r} type mismatch: vertex {v_out[name]} vs fragment {vtype}")
    return errors


def extract_viewer_programs(js_source: str) -> list[tuple[str, str, str]]:
    """Pull the (name, vert, frag) shader pairs out of viewer.js."""
    srcs = dict(re.findall(r"const\s+(\w+_SRC)\s*=\s*`([^`]*)`", js_source))
    programs = []
    for vert_name in [k for k in srcs if k.endswith("VERT_SRC")]:
        frag_name = vert_name.replace("VERT_SRC", "FRAG_SRC")
        if frag_name in srcs:
            name = vert_name[: -len("VERT_SRC")].rstrip("_") or "main"
            programs.append((name, srcs[vert_name], srcs[frag_name]))
    return programs


def main() -> int:
    import os.path as osp
    import sys

    js_path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                       "muggled_dpt_tpu", "demo_helpers", "viewer3d", "viewer.js")
    js = open(js_path).read()
    programs = extract_viewer_programs(js)
    assert programs, "no shader programs found in viewer.js"
    ok = True
    for name, vert, frag in programs:
        errs = check_program(vert, frag)
        status = "OK" if not errs else "FAIL"
        print(f"[{status}] program {name or 'main'}")
        for e in errs:
            print(f"    {e}")
            ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
