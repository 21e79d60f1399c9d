"""Helper: compile the reference C library once into a static archive for
golden-vector generation (used by tools/gen_*_golden.py).

The reference tree (read-only) is copied to /tmp and compiled with the
portable (non-SIMD) sources from its own makefile object list.  Nothing
from the reference enters the repository except numeric test vectors.
"""
import pathlib
import re
import shutil
import subprocess

REF = pathlib.Path("/root/reference")
WORK = pathlib.Path("/tmp/liquid_refbuild")
ARCHIVE = WORK / "libliquidref.a"

CONFIG_H = """
#define HAVE_STDIO_H 1
#define HAVE_STDLIB_H 1
#define HAVE_COMPLEX_H 1
#define HAVE_STRING_H 1
#define HAVE_MATH_H 1
#define SIZEOF_INT 4
#define SIZEOF_UNSIGNED_INT 4
"""


def build() -> pathlib.Path:
    """Build (or reuse) the reference static library; returns its path."""
    if ARCHIVE.exists():
        return ARCHIVE
    WORK.mkdir(parents=True, exist_ok=True)
    src = WORK / "src"
    if not src.exists():
        shutil.copytree(REF / "src", src)
        shutil.copytree(REF / "include", WORK / "include")
    (WORK / "config.h").write_text(CONFIG_H)
    makefile = (REF / "makefile.in").read_text()
    objs = sorted(set(re.findall(r"src/[a-z]+/src/[A-Za-z0-9_.]+\.o",
                                 makefile)))
    objdir = WORK / "obj"
    objdir.mkdir(exist_ok=True)
    built = []
    for o in objs:
        c = o[:-2] + ".c"
        if any(t in c for t in (".mmx.", ".sse", ".neon.", ".av.")):
            continue
        cfile = WORK / c
        if not cfile.exists():
            continue
        out = objdir / (c.replace("/", "_")[:-2] + ".o")
        r = subprocess.run(["gcc", "-O2", "-c", "-I", str(WORK),
                            "-I", str(WORK / "include"),
                            "-o", str(out), str(cfile)],
                           capture_output=True)
        if r.returncode == 0:
            built.append(out)
    subprocess.run(["ar", "rcs", str(ARCHIVE)] +
                   [str(b) for b in built], check=True)
    return ARCHIVE


def compile_and_run(c_source: str, name: str) -> str:
    """Compile a generator program against the archive and return stdout."""
    lib = build()
    cdir = WORK / name
    cdir.mkdir(exist_ok=True)
    (cdir / "gen.c").write_text(c_source)
    exe = cdir / "gen"
    subprocess.run(["gcc", "-O1", "-I", str(WORK),
                    "-I", str(WORK / "include"),
                    "-o", str(exe), str(cdir / "gen.c"), str(lib), "-lm"],
                   check=True, capture_output=True)
    return subprocess.run([str(exe)], check=True, capture_output=True,
                          text=True).stdout
