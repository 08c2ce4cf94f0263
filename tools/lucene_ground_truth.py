#!/usr/bin/env python3
"""Ground-truth oracle: compile the reference's own lucene-core with javac
and score queries with the REAL SloppyPhraseScorer / ExactPhraseScorer.

The reference at /root/reference is source-only; lucene-core 7.0 compiles
clean with plain `javac -encoding UTF-8` (no ant/ivy needed). A tiny Java
harness indexes one whitespace-tokenized doc per case and reports the
positional phrase freq via IndexSearcher.explain ("phraseFreq=X" /
"termFreq=X"), which is the exact float the scorer computed.

Used by tests/test_lucene_ground_truth.py to verify search/sloppy.py
(including the multi-term-repeats path) against the actual compiled
reference — stronger than any transliteration. Build products are cached
under /tmp/lucene_build; everything is re-derivable, nothing is written
to the read-only reference tree.

Case line protocol (stdin -> one result line per case):
  <slop>;<off>:<t1>,<t2>;<off>:<t3>#<doc tokens>
Result: the phrase freq Float.toString'd, or 0.0 when the doc has no
match (scorer returns no hit).
"""

from __future__ import annotations

import os
import subprocess
import sys

REF_CORE = "/root/reference/lucene/core/src/java"
REF_RES = "/root/reference/lucene/core/src/resources"
BUILD = os.environ.get("LUCENE_GT_BUILD", "/tmp/lucene_build")
CLASSES = os.path.join(BUILD, "classes")
HARNESS_DIR = os.path.join(BUILD, "gt_harness")

HARNESS_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;

public class GroundTruth {
  static final class WS extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new Tokenizer() {
        final org.apache.lucene.analysis.tokenattributes.CharTermAttribute term =
            addAttribute(org.apache.lucene.analysis.tokenattributes.CharTermAttribute.class);
        final org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute pi =
            addAttribute(org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute.class);
        java.util.List<String> toks; int i;
        public boolean incrementToken() throws java.io.IOException {
          if (toks == null) {
            StringBuilder sb = new StringBuilder(); int c;
            while ((c = input.read()) != -1) sb.append((char) c);
            toks = new java.util.ArrayList<>();
            for (String s : sb.toString().split("\\s+")) if (!s.isEmpty()) toks.add(s);
            i = 0;
          }
          if (i >= toks.size()) return false;
          clearAttributes(); pi.setPositionIncrement(1);
          term.append(toks.get(i++)); return true;
        }
        public void reset() throws java.io.IOException { super.reset(); toks = null; }
      };
      return new TokenStreamComponents(t);
    }
  }

  static float phraseFreq(Explanation e) {
    // BM25's leaf "freq, occurrences of term within document" value is
    // the phrase freq the scorer computed (Float, exact)
    if (e.getDescription().contains("occurrences of term within document")
        || e.getDescription().startsWith("phraseFreq=")
        || e.getDescription().startsWith("termFreq=")) {
      return e.getValue();
    }
    for (Explanation d : e.getDetails()) {
      float f = phraseFreq(d);
      if (!Float.isNaN(f)) return f;
    }
    return Float.NaN;
  }

  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    while ((line = in.readLine()) != null) {
      if (line.isEmpty()) continue;
      int hash = line.indexOf('#');
      String spec = line.substring(0, hash);
      String doc = line.substring(hash + 1);
      String[] parts = spec.split(";");
      int slop = Integer.parseInt(parts[0]);

      Directory dir = new RAMDirectory();
      IndexWriter w = new IndexWriter(dir, new IndexWriterConfig(new WS()));
      Document d = new Document();
      d.add(new Field("body", doc, new FieldType(TextField.TYPE_NOT_STORED)));
      w.addDocument(d);
      w.close();
      IndexReader r = DirectoryReader.open(dir);
      IndexSearcher s = new IndexSearcher(r);

      MultiPhraseQuery.Builder qb = new MultiPhraseQuery.Builder();
      for (int pi = 1; pi < parts.length; pi++) {
        String[] kv = parts[pi].split(":");
        int off = Integer.parseInt(kv[0]);
        String[] alts = kv[1].split(",");
        Term[] ts = new Term[alts.length];
        for (int j = 0; j < alts.length; j++) ts[j] = new Term("body", alts[j]);
        qb.add(ts, off);
      }
      qb.setSlop(slop);
      Query q = qb.build();
      TopDocs td = s.search(q, 1);
      if (td.totalHits == 0) {
        System.out.println("0.0");
      } else {
        float freq = phraseFreq(s.explain(q, td.scoreDocs[0].doc));
        System.out.println(Float.toString(freq));
      }
      r.close();
      dir.close();
    }
  }
}
"""


def build() -> bool:
    """Compile lucene-core + harness (cached). False if javac missing."""
    import shutil

    if shutil.which("javac") is None or not os.path.isdir(REF_CORE):
        return False
    os.makedirs(CLASSES, exist_ok=True)
    marker = os.path.join(CLASSES, "org/apache/lucene/search/SloppyPhraseScorer.class")
    if not os.path.exists(marker):
        srcs = os.path.join(BUILD, "srcs.txt")
        with open(srcs, "w") as f:
            for root, _dirs, files in os.walk(REF_CORE):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-d", CLASSES, "@" + srcs],
            capture_output=True, text=True, timeout=600,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
        # codec SPI files
        meta = os.path.join(REF_RES, "META-INF")
        if os.path.isdir(meta):
            shutil.copytree(meta, os.path.join(CLASSES, "META-INF"), dirs_exist_ok=True)
    os.makedirs(HARNESS_DIR, exist_ok=True)
    cls = os.path.join(HARNESS_DIR, "GroundTruth.class")
    src = os.path.join(HARNESS_DIR, "GroundTruth.java")
    if not os.path.exists(cls):
        with open(src, "w") as f:
            f.write(HARNESS_JAVA)
        r = subprocess.run(
            ["javac", "-cp", CLASSES, "-d", HARNESS_DIR, src],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    return True


def run_cases(lines: list[str]) -> list[str]:
    """Feed case lines to the harness; returns one freq string per case."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruth"],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return r.stdout.split()


def case_line(slop: int, mphrase: list[tuple[int, tuple[str, ...]]], doc: str) -> str:
    spec = ";".join(
        [str(slop)] + [f"{off}:{','.join(alts)}" for off, alts in mphrase]
    )
    return f"{spec}#{doc}"


if __name__ == "__main__":
    ok = build()
    print("build:", ok)
    if ok:
        print(run_cases([
            case_line(6, [(0, ("a", "b")), (1, ("a",))], "a b c d e f g h i k"),
            case_line(2, [(0, ("a",)), (1, ("b",))], "x a b a y"),
        ]))
