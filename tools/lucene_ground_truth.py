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


TOPK_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;

public class GroundTruthTopK {
  static org.apache.lucene.search.similarities.Similarity sim(String name) {
    switch (name) {
      case "bm25": return new org.apache.lucene.search.similarities.BM25Similarity();
      case "classic": return new org.apache.lucene.search.similarities.ClassicSimilarity();
      case "lm_dirichlet": return new org.apache.lucene.search.similarities.LMDirichletSimilarity();
      case "lm_jelinek_mercer": return new org.apache.lucene.search.similarities.LMJelinekMercerSimilarity(0.7f);
      case "dfr_inl2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelIn(),
          new org.apache.lucene.search.similarities.AfterEffectL(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "ib_ll": return new org.apache.lucene.search.similarities.IBSimilarity(
          new org.apache.lucene.search.similarities.DistributionLL(),
          new org.apache.lucene.search.similarities.LambdaDF(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_gb2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelG(),
          new org.apache.lucene.search.similarities.AfterEffectB(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_ifb2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelIF(),
          new org.apache.lucene.search.similarities.AfterEffectB(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_ineb2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelIne(),
          new org.apache.lucene.search.similarities.AfterEffectB(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "ib_spl_ttf": return new org.apache.lucene.search.similarities.IBSimilarity(
          new org.apache.lucene.search.similarities.DistributionSPL(),
          new org.apache.lucene.search.similarities.LambdaTTF(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_inl1": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelIn(),
          new org.apache.lucene.search.similarities.AfterEffectL(),
          new org.apache.lucene.search.similarities.NormalizationH1());
      case "dfr_inl3": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelIn(),
          new org.apache.lucene.search.similarities.AfterEffectL(),
          new org.apache.lucene.search.similarities.NormalizationH3());
      case "dfr_inlz": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelIn(),
          new org.apache.lucene.search.similarities.AfterEffectL(),
          new org.apache.lucene.search.similarities.NormalizationZ());
      case "dfr_beb2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelBE(),
          new org.apache.lucene.search.similarities.AfterEffectB(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_bel2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelBE(),
          new org.apache.lucene.search.similarities.AfterEffectL(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_pb2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelP(),
          new org.apache.lucene.search.similarities.AfterEffectB(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_pl2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelP(),
          new org.apache.lucene.search.similarities.AfterEffectL(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_db2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelD(),
          new org.apache.lucene.search.similarities.AfterEffectB(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfr_dl2": return new org.apache.lucene.search.similarities.DFRSimilarity(
          new org.apache.lucene.search.similarities.BasicModelD(),
          new org.apache.lucene.search.similarities.AfterEffectL(),
          new org.apache.lucene.search.similarities.NormalizationH2());
      case "dfi_chi_squared": return new org.apache.lucene.search.similarities.DFISimilarity(
          new org.apache.lucene.search.similarities.IndependenceChiSquared());
      case "dfi_standardized": return new org.apache.lucene.search.similarities.DFISimilarity(
          new org.apache.lucene.search.similarities.IndependenceStandardized());
      case "dfi_saturated": return new org.apache.lucene.search.similarities.DFISimilarity(
          new org.apache.lucene.search.similarities.IndependenceSaturated());
      case "multi_bm25_classic": return new org.apache.lucene.search.similarities.MultiSimilarity(
          new org.apache.lucene.search.similarities.Similarity[] {
              new org.apache.lucene.search.similarities.BM25Similarity(),
              new org.apache.lucene.search.similarities.ClassicSimilarity()});
      case "sweetspot": {
        org.apache.lucene.misc.SweetSpotSimilarity ss =
            new org.apache.lucene.misc.SweetSpotSimilarity();
        ss.setLengthNormFactors(3, 10, 0.5f, false);
        ss.setBaselineTfFactors(1.5f, 2.0f);
        return ss;
      }
      default: throw new IllegalArgumentException(name);
    }
  }

  public static void main(String[] args) throws Exception {
    org.apache.lucene.search.similarities.Similarity similarity =
        sim(args.length > 0 ? args[0] : "bm25");
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    // one segment: global stats == per-leaf stats, same as the engine;
    // similarity set at INDEX time too (computeNorm) as the engine does
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    cfg.setSimilarity(similarity);
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    s.setSimilarity(similarity);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      Query q;
      if (p[0].equals("TERM")) {
        q = new TermQuery(new Term("body", p[1]));
      } else if (p[0].equals("OR") || p[0].equals("AND")) {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 1; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])),
                p[0].equals("AND") ? BooleanClause.Occur.MUST
                                   : BooleanClause.Occur.SHOULD);
        q = b.build();
      } else if (p[0].equals("MSM")) {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.setMinimumNumberShouldMatch(Integer.parseInt(p[1]));
        for (int i = 2; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        q = b.build();
      } else if (p[0].equals("PHRASE")) {
        int slop = Integer.parseInt(p[1]);
        PhraseQuery.Builder b = new PhraseQuery.Builder();
        b.setSlop(slop);
        for (int i = 2; i < p.length; i++) b.add(new Term("body", p[i]), i - 2);
        q = b.build();
      } else if (p[0].equals("BOOST")) {
        // BOOST t1:b1 t2:b2 ... -> SHOULD of BoostQuery(TermQuery)
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 1; i < p.length; i++) {
          String[] kv = p[i].split(":");
          b.add(new BoostQuery(new TermQuery(new Term("body", kv[0])),
                               Float.parseFloat(kv[1])),
                BooleanClause.Occur.SHOULD);
        }
        q = b.build();
      } else if (p[0].equals("BPHRASE")) {
        // BPHRASE boost slop t1 t2 ... -> BoostQuery(PhraseQuery)
        float boost = Float.parseFloat(p[1]);
        int slop = Integer.parseInt(p[2]);
        PhraseQuery.Builder b = new PhraseQuery.Builder();
        b.setSlop(slop);
        for (int i = 3; i < p.length; i++) b.add(new Term("body", p[i]), i - 3);
        q = new BoostQuery(b.build(), boost);
      } else if (p[0].equals("NOT")) {
        // NOT <nShould> s1..sn m1..mk
        int ns = Integer.parseInt(p[1]);
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 2; i < 2 + ns; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        for (int i = 2 + ns; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.MUST_NOT);
        q = b.build();
      } else if (p[0].equals("DISMAX")) {
        float tie = Float.parseFloat(p[1]);
        java.util.List<Query> subs = new java.util.ArrayList<>();
        for (int i = 2; i < p.length; i++)
          subs.add(new TermQuery(new Term("body", p[i])));
        q = new DisjunctionMaxQuery(subs, tie);
      } else if (p[0].equals("BOOSTING")) {
        // BOOSTING <boost> <nMatch> m1..mn c1..ck ->
        // BoostingQuery(OR(match), OR(context), boost)
        float bst = Float.parseFloat(p[1]);
        int nm = Integer.parseInt(p[2]);
        BooleanQuery.Builder mb = new BooleanQuery.Builder();
        for (int i = 3; i < 3 + nm; i++)
          mb.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        BooleanQuery.Builder cb = new BooleanQuery.Builder();
        for (int i = 3 + nm; i < p.length; i++)
          cb.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        q = new org.apache.lucene.queries.BoostingQuery(mb.build(), cb.build(), bst);
      } else if (p[0].equals("CTQ")) {
        // CTQ <maxTermFrequency> t1 t2 ... -> CommonTermsQuery(SHOULD, SHOULD, mtf)
        org.apache.lucene.queries.CommonTermsQuery c =
            new org.apache.lucene.queries.CommonTermsQuery(
                BooleanClause.Occur.SHOULD, BooleanClause.Occur.SHOULD,
                Float.parseFloat(p[1]));
        for (int i = 2; i < p.length; i++) c.add(new Term("body", p[i]));
        q = c;
      } else if (p[0].equals("SPANNEAR")) {
        int slop = Integer.parseInt(p[1]);
        boolean ord = p[2].equals("1");
        org.apache.lucene.search.spans.SpanQuery[] cls =
            new org.apache.lucene.search.spans.SpanQuery[p.length - 3];
        for (int i = 3; i < p.length; i++)
          cls[i - 3] = new org.apache.lucene.search.spans.SpanTermQuery(
              new Term("body", p[i]));
        q = new org.apache.lucene.search.spans.SpanNearQuery(cls, slop, ord);
      } else if (p[0].equals("SPANNEARALT")) {
        // SPANNEARALT slop ord a,b c ... -> SpanNear over SpanOr-of-term
        // clauses (single alternative stays a SpanTermQuery); alternative
        // sets may OVERLAP across clauses (same-position repeats).
        int slop = Integer.parseInt(p[1]);
        boolean ord = p[2].equals("1");
        org.apache.lucene.search.spans.SpanQuery[] cls =
            new org.apache.lucene.search.spans.SpanQuery[p.length - 3];
        for (int i = 3; i < p.length; i++) {
          String[] alts = p[i].split(",");
          if (alts.length == 1) {
            cls[i - 3] = new org.apache.lucene.search.spans.SpanTermQuery(
                new Term("body", alts[0]));
          } else {
            org.apache.lucene.search.spans.SpanQuery[] sub =
                new org.apache.lucene.search.spans.SpanQuery[alts.length];
            for (int j = 0; j < alts.length; j++)
              sub[j] = new org.apache.lucene.search.spans.SpanTermQuery(
                  new Term("body", alts[j]));
            cls[i - 3] = new org.apache.lucene.search.spans.SpanOrQuery(sub);
          }
        }
        q = new org.apache.lucene.search.spans.SpanNearQuery(cls, slop, ord);
      } else if (p[0].equals("SPANFIRST")) {
        int end = Integer.parseInt(p[1]);
        q = new org.apache.lucene.search.spans.SpanFirstQuery(
            new org.apache.lucene.search.spans.SpanTermQuery(new Term("body", p[2])),
            end);
      } else if (p[0].equals("MPHRASE")) {
        int slop = Integer.parseInt(p[1]);
        MultiPhraseQuery.Builder b = new MultiPhraseQuery.Builder();
        for (int i = 2; i < p.length; i++) {
          String[] kv = p[i].split(":");
          String[] alts = kv[1].split(",");
          Term[] ts = new Term[alts.length];
          for (int j = 0; j < alts.length; j++) ts[j] = new Term("body", alts[j]);
          b.add(ts, Integer.parseInt(kv[0]));
        }
        b.setSlop(slop);
        q = b.build();
      } else if (p[0].equals("SYN")) {
        Term[] ts = new Term[p.length - 1];
        for (int i = 1; i < p.length; i++) ts[i - 1] = new Term("body", p[i]);
        q = new SynonymQuery(ts);
      } else if (p[0].equals("BLEND")) {
        // BLEND tie t1 t2 ... -> BlendedTermQuery + DisjunctionMaxRewrite
        float tie = Float.parseFloat(p[1]);
        BlendedTermQuery.Builder b = new BlendedTermQuery.Builder()
            .setRewriteMethod(new BlendedTermQuery.DisjunctionMaxRewrite(tie));
        for (int i = 2; i < p.length; i++) b.add(new Term("body", p[i]));
        q = b.build();
      } else if (p[0].equals("CONST")) {
        // CONST boost nConst c1..cn s1..sk ->
        //   SHOULD[BoostQuery(ConstantScoreQuery(OR(c..)), boost), Term(s)..]
        float boost = Float.parseFloat(p[1]);
        int nc = Integer.parseInt(p[2]);
        BooleanQuery.Builder inner = new BooleanQuery.Builder();
        for (int i = 3; i < 3 + nc; i++)
          inner.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        BooleanQuery.Builder outer = new BooleanQuery.Builder();
        outer.add(new BoostQuery(new ConstantScoreQuery(inner.build()), boost),
                  BooleanClause.Occur.SHOULD);
        for (int i = 3 + nc; i < p.length; i++)
          outer.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        q = outer.build();
      } else if (p[0].equals("SPANOR")) {
        org.apache.lucene.search.spans.SpanQuery[] cls =
            new org.apache.lucene.search.spans.SpanQuery[p.length - 1];
        for (int i = 1; i < p.length; i++)
          cls[i - 1] = new org.apache.lucene.search.spans.SpanTermQuery(
              new Term("body", p[i]));
        q = new org.apache.lucene.search.spans.SpanOrQuery(cls);
      } else if (p[0].equals("SPANNOT") || p[0].equals("SPANCONTAIN")
                 || p[0].equals("SPANWITHIN")) {
        // <OP> slop nInc i1..in e1..ek: include/big = ordered SpanNear
        // over i*, other side = SpanOr over e* (single term stays a
        // SpanTermQuery, the engine/oracle shape)
        int slop = Integer.parseInt(p[1]);
        int ni = Integer.parseInt(p[2]);
        org.apache.lucene.search.spans.SpanQuery[] inc =
            new org.apache.lucene.search.spans.SpanQuery[ni];
        for (int i = 3; i < 3 + ni; i++)
          inc[i - 3] = new org.apache.lucene.search.spans.SpanTermQuery(
              new Term("body", p[i]));
        org.apache.lucene.search.spans.SpanQuery big = inc.length == 1
            ? inc[0]
            : new org.apache.lucene.search.spans.SpanNearQuery(inc, slop, true);
        org.apache.lucene.search.spans.SpanQuery[] exc =
            new org.apache.lucene.search.spans.SpanQuery[p.length - 3 - ni];
        for (int i = 3 + ni; i < p.length; i++)
          exc[i - 3 - ni] = new org.apache.lucene.search.spans.SpanTermQuery(
              new Term("body", p[i]));
        org.apache.lucene.search.spans.SpanQuery other = exc.length == 1
            ? exc[0] : new org.apache.lucene.search.spans.SpanOrQuery(exc);
        if (p[0].equals("SPANNOT")) {
          q = new org.apache.lucene.search.spans.SpanNotQuery(big, other);
        } else if (p[0].equals("SPANCONTAIN")) {
          q = new org.apache.lucene.search.spans.SpanContainingQuery(big, other);
        } else {
          q = new org.apache.lucene.search.spans.SpanWithinQuery(big, other);
        }
      } else if (p[0].equals("SPANPOSRANGE")) {
        // SPANPOSRANGE lo hi t
        q = new org.apache.lucene.search.spans.SpanPositionRangeQuery(
            new org.apache.lucene.search.spans.SpanTermQuery(new Term("body", p[3])),
            Integer.parseInt(p[1]), Integer.parseInt(p[2]));
      } else if (p[0].equals("AUTO")) {
        // AUTO <nAcc> a.. <nArcs> (<from> <label|_ANY_> <to>)*
        org.apache.lucene.search.TermAutomatonQuery aq =
            new org.apache.lucene.search.TermAutomatonQuery("body");
        int at = 1;
        int nAcc = Integer.parseInt(p[at++]);
        int[] accs = new int[nAcc];
        for (int i = 0; i < nAcc; i++) accs[i] = Integer.parseInt(p[at++]);
        int nArcs = Integer.parseInt(p[at++]);
        int[] fs = new int[nArcs];
        int[] tos = new int[nArcs];
        String[] labs = new String[nArcs];
        int maxState = 0;
        for (int i = 0; i < nArcs; i++) {
          fs[i] = Integer.parseInt(p[at++]);
          labs[i] = p[at++];
          tos[i] = Integer.parseInt(p[at++]);
          maxState = Math.max(maxState, Math.max(fs[i], tos[i]));
        }
        for (int i = 0; i < nAcc; i++) maxState = Math.max(maxState, accs[i]);
        for (int i = 0; i <= maxState; i++) aq.createState();
        for (int i = 0; i < nArcs; i++) {
          if (labs[i].equals("_ANY_")) aq.addAnyTransition(fs[i], tos[i]);
          else aq.addTransition(fs[i], tos[i], labs[i]);
        }
        for (int i = 0; i < nAcc; i++) aq.setAccept(accs[i], true);
        aq.finish();
        q = aq;
      } else if (p[0].equals("RESCORE")) {
        // RESCORE weight firstN topN n1 q1t.. (OR t.. | PHRASE slop t..)
        // -> QueryRescorer.rescore(searcher, search(OR(q1), firstN), q2,
        //    weight, topN)   (QueryRescorer.java:167 static sugar)
        double wgt = Double.parseDouble(p[1]);
        int firstN = Integer.parseInt(p[2]);
        int topN = Integer.parseInt(p[3]);
        int n1 = Integer.parseInt(p[4]);
        BooleanQuery.Builder b1 = new BooleanQuery.Builder();
        for (int i = 5; i < 5 + n1; i++)
          b1.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        Query q2;
        int at = 5 + n1;
        if (p[at].equals("PHRASE")) {
          int slop = Integer.parseInt(p[at + 1]);
          PhraseQuery.Builder pb = new PhraseQuery.Builder();
          pb.setSlop(slop);
          for (int i = at + 2; i < p.length; i++)
            pb.add(new Term("body", p[i]), i - at - 2);
          q2 = pb.build();
        } else {
          BooleanQuery.Builder b2 = new BooleanQuery.Builder();
          for (int i = at + 1; i < p.length; i++)
            b2.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
          q2 = b2.build();
        }
        TopDocs first = s.search(b1.build(), firstN);
        TopDocs td2 = QueryRescorer.rescore(s, first, q2, wgt, topN);
        StringBuilder out2 = new StringBuilder();
        for (ScoreDoc sd : td2.scoreDocs) {
          if (out2.length() > 0) out2.append(";");
          out2.append(sd.doc).append(":").append(Float.toString(sd.score));
        }
        System.out.println(out2.length() == 0 ? "-" : out2.toString());
        continue;
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


TOKENIZE_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.analysis.standard.StandardAnalyzer;
import org.apache.lucene.analysis.tokenattributes.*;

public class GroundTruthTokenize {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in,
            java.nio.charset.StandardCharsets.UTF_8));
    java.io.PrintStream out = new java.io.PrintStream(
        System.out, true, "UTF-8");
    StandardAnalyzer a = new StandardAnalyzer();
    int n = Integer.parseInt(in.readLine().trim());
    for (int i = 0; i < n; i++) {
      String line = in.readLine();
      TokenStream ts = a.tokenStream("f", line);
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi =
          ts.addAttribute(PositionIncrementAttribute.class);
      ts.reset();
      StringBuilder sb = new StringBuilder();
      int pos = -1;
      while (ts.incrementToken()) {
        pos += pi.getPositionIncrement();
        if (sb.length() > 0) sb.append(" ");
        sb.append(pos).append("|").append(term.toString());
      }
      ts.end();
      ts.close();
      out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


EXPLAIN_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;

public class GroundTruthExplain {
  static void ser(Explanation e, StringBuilder sb) {
    if (sb.length() > 0) sb.append(" ");
    sb.append(e.isMatch() ? "M" : "N").append(":")
      .append(Float.toString(e.getValue())).append(":")
      .append(e.getDetails().length);
    for (Explanation d : e.getDetails()) ser(d, sb);
  }

  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // <docid> <SHAPE...>: TERM t | OR t.. | AND t.. | MSM n t.. |
      // BOOST t:b .. | NOT ns s.. m.. | MIX nm m.. s.. | PHRASE slop t..
      String[] p = in.readLine().trim().split(" ");
      int docid = Integer.parseInt(p[0]);
      Query q;
      if (p[1].equals("TERM")) {
        q = new TermQuery(new Term("body", p[2]));
      } else if (p[1].equals("OR") || p[1].equals("AND")) {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 2; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])),
                p[1].equals("AND") ? BooleanClause.Occur.MUST
                                   : BooleanClause.Occur.SHOULD);
        q = b.build();
      } else if (p[1].equals("MSM")) {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        b.setMinimumNumberShouldMatch(Integer.parseInt(p[2]));
        for (int i = 3; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        q = b.build();
      } else if (p[1].equals("BOOST")) {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 2; i < p.length; i++) {
          String[] kv = p[i].split(":");
          b.add(new BoostQuery(new TermQuery(new Term("body", kv[0])),
                               Float.parseFloat(kv[1])),
                BooleanClause.Occur.SHOULD);
        }
        q = b.build();
      } else if (p[1].equals("NOT")) {
        int ns = Integer.parseInt(p[2]);
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 3; i < 3 + ns; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        for (int i = 3 + ns; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.MUST_NOT);
        q = b.build();
      } else if (p[1].equals("MIX")) {
        // MUST clauses first, then SHOULD (clause order = add order)
        int nm = Integer.parseInt(p[2]);
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 3; i < 3 + nm; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.MUST);
        for (int i = 3 + nm; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        q = b.build();
      } else if (p[1].equals("PHRASE")) {
        int slop = Integer.parseInt(p[2]);
        PhraseQuery.Builder b = new PhraseQuery.Builder();
        b.setSlop(slop);
        for (int i = 3; i < p.length; i++) b.add(new Term("body", p[i]), i - 3);
        q = b.build();
      } else {
        throw new IllegalArgumentException(p[1]);
      }
      StringBuilder sb = new StringBuilder();
      ser(s.explain(q, docid), sb);
      System.out.println(sb.toString());
    }
    r.close();
  }
}
"""


ANALYZINGQP_JAVA = r"""
import org.apache.lucene.analysis.standard.StandardAnalyzer;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.queryparser.analyzing.AnalyzingQueryParser;

public class GroundTruthAnalyzingQP {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in,
            java.nio.charset.StandardCharsets.UTF_8));
    StandardAnalyzer analyzer = new StandardAnalyzer();
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(analyzer);
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body",
          java.net.URLDecoder.decode(in.readLine(), "UTF-8"), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String qstr = java.net.URLDecoder.decode(in.readLine(), "UTF-8");
      Query q;
      try {
        q = new AnalyzingQueryParser("body", analyzer).parse(qstr);
      } catch (Exception e) {
        System.out.println("PARSE_ERROR:" + e.getClass().getSimpleName());
        continue;
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


FLEXIBLE_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.queryparser.flexible.standard.StandardQueryParser;

public class GroundTruthFlexible {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String qstr = in.readLine();
      StandardQueryParser qp = new StandardQueryParser(new GroundTruth.WS());
      if (qstr.startsWith("ANDOP ")) {
        qp.setDefaultOperator(
            org.apache.lucene.queryparser.flexible.standard.config
                .StandardQueryConfigHandler.Operator.AND);
        qstr = qstr.substring(6);
      }
      Query q;
      try {
        q = qp.parse(qstr, "body");
      } catch (Exception e) {
        System.out.println("PARSE_ERROR:" + e.getClass().getSimpleName());
        continue;
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


CLASSICHL_JAVA = r"""
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.standard.StandardAnalyzer;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.queryparser.classic.QueryParser;
import org.apache.lucene.search.Query;
import org.apache.lucene.search.highlight.Highlighter;
import org.apache.lucene.search.highlight.QueryScorer;
import org.apache.lucene.search.highlight.SimpleFragmenter;
import org.apache.lucene.search.highlight.TextFragment;
import org.apache.lucene.store.RAMDirectory;

public class GroundTruthClassicHL {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in,
            java.nio.charset.StandardCharsets.UTF_8));
    java.io.PrintStream out = new java.io.PrintStream(System.out, true, "UTF-8");
    StandardAnalyzer analyzer = new StandardAnalyzer();
    int nDocs = Integer.parseInt(in.readLine().trim());
    String[] docs = new String[nDocs];
    for (int i = 0; i < nDocs; i++)
      docs[i] = java.net.URLDecoder.decode(in.readLine(), "UTF-8");
    // a corpus index for the reader-weighted mode
    // (getWeightedSpanTermsWithScores: weight *= classic idf)
    RAMDirectory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(analyzer);
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("f", docs[i], ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader reader = DirectoryReader.open(dir);
    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // HL <fragmentSize> <maxNumFragments> <S|P> <url-encoded query>
      // S = SimpleFragmenter, P = SimpleSpanFragmenter(queryScorer)
      String[] p = in.readLine().trim().split(" ");
      int fragSize = Integer.parseInt(p[1]);
      int maxFrags = Integer.parseInt(p[2]);
      boolean spanFrag = p[3].startsWith("P");
      boolean withReader = p[3].endsWith("R");
      Query q = new QueryParser("f", analyzer)
          .parse(java.net.URLDecoder.decode(p[4], "UTF-8"));
      for (int i = 0; i < nDocs; i++) {
        // a fresh Highlighter per doc: QueryScorer caches the extracted
        // weighted span terms against the DOC's own MemoryIndex
        QueryScorer qs = withReader
            ? new QueryScorer(q, reader, "f") : new QueryScorer(q, "f");
        Highlighter h = new Highlighter(qs);
        h.setTextFragmenter(spanFrag
            ? new org.apache.lucene.search.highlight.SimpleSpanFragmenter(qs, fragSize)
            : new SimpleFragmenter(fragSize));
        TokenStream ts = analyzer.tokenStream("f", docs[i]);
        TextFragment[] frags =
            h.getBestTextFragments(ts, docs[i], true, maxFrags);
        StringBuilder sb = new StringBuilder();
        for (TextFragment fr : frags) {
          if (sb.length() > 0) sb.append(";");
          sb.append(java.net.URLEncoder.encode(fr.toString(), "UTF-8"))
            .append("|").append(Float.toString(fr.getScore()));
        }
        out.println(sb.length() == 0 ? "-" : sb.toString());
      }
    }
  }
}
"""


XML_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.queryparser.xml.CoreParser;
import org.apache.lucene.queryparser.xml.CorePlusQueriesParser;

public class GroundTruthXml {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    int nQ = Integer.parseInt(in.readLine().trim());
    // one single-line XML query per case; parse errors print "!<msg>"
    for (int qi = 0; qi < nQ; qi++) {
      String xml = in.readLine();
      // CorePlusQueriesParser = CoreParser + LikeThisQuery/BoostingQuery
      CoreParser cp = new CorePlusQueriesParser("body", new GroundTruth.WS());
      try {
        Query q = cp.parse(new java.io.ByteArrayInputStream(
            xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)));
        TopDocs td = s.search(q, 10);
        StringBuilder out = new StringBuilder();
        for (ScoreDoc sd : td.scoreDocs) {
          if (out.length() > 0) out.append(";");
          out.append(sd.doc).append(":").append(Float.toString(sd.score));
        }
        System.out.println(out.length() == 0 ? "-" : out.toString());
      } catch (Exception pe) {
        System.out.println("!" + pe.getClass().getSimpleName());
      }
    }
    r.close();
  }
}
"""


SIMPLE_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.queryparser.simple.SimpleQueryParser;

public class GroundTruthSimple {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    int nQ = Integer.parseInt(in.readLine().trim());
    // case line: <AND|OR> \t <flags int> \t <raw query (may hold spaces)>
    for (int qi = 0; qi < nQ; qi++) {
      String[] parts = in.readLine().split("\t", 3);
      int flags = Integer.parseInt(parts[1]);
      SimpleQueryParser sp = new SimpleQueryParser(
          new GroundTruth.WS(),
          java.util.Collections.singletonMap("body", 1.0f), flags);
      sp.setDefaultOperator("AND".equals(parts[0])
          ? org.apache.lucene.search.BooleanClause.Occur.MUST
          : org.apache.lucene.search.BooleanClause.Occur.SHOULD);
      Query q = sp.parse(parts[2]);
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


PARSER_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.queryparser.classic.QueryParser;

public class GroundTruthParser {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String qstr = in.readLine();
      QueryParser qp = new QueryParser("body", new GroundTruth.WS());
      if (qstr.startsWith("ANDOP ")) {
        qp.setDefaultOperator(QueryParser.Operator.AND);
        qstr = qstr.substring(6);
      }
      Query q = qp.parse(qstr);
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


PAYLOAD_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.util.BytesRef;
import org.apache.lucene.store.*;
import org.apache.lucene.queries.payloads.*;
import org.apache.lucene.search.spans.*;

public class GroundTruthPayload {
  // WhitespaceTokenizer + DelimitedPayloadTokenFilter(FloatEncoder)
  // behavior, inlined: term = before the first '|', payload = 4-byte
  // big-endian float (PayloadHelper.encodeFloat); no '|' -> no payload
  static final class PayloadWS extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new Tokenizer() {
        final org.apache.lucene.analysis.tokenattributes.CharTermAttribute term =
            addAttribute(org.apache.lucene.analysis.tokenattributes.CharTermAttribute.class);
        final org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute pi =
            addAttribute(org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute.class);
        final org.apache.lucene.analysis.tokenattributes.PayloadAttribute pay =
            addAttribute(org.apache.lucene.analysis.tokenattributes.PayloadAttribute.class);
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
          String tok = toks.get(i++);
          int d = tok.indexOf('|');
          if (d >= 0) {
            float v = Float.parseFloat(tok.substring(d + 1));
            int bits = Float.floatToIntBits(v);
            byte[] b = new byte[]{(byte)(bits >>> 24), (byte)(bits >>> 16),
                                  (byte)(bits >>> 8), (byte)bits};
            pay.setPayload(new BytesRef(b));
            term.append(tok, 0, d);
          } else {
            pay.setPayload(null);
            term.append(tok);
          }
          return true;
        }
        public void reset() throws java.io.IOException { super.reset(); toks = null; }
      };
      return new TokenStreamComponents(t);
    }
  }

  // BM25 with computePayloadFactor = PayloadHelper.decodeFloat (the
  // float-payload pairing; BM25's own SimScorer returns 1)
  static final class PayloadBM25 extends org.apache.lucene.search.similarities.Similarity {
    final org.apache.lucene.search.similarities.BM25Similarity in =
        new org.apache.lucene.search.similarities.BM25Similarity();
    public long computeNorm(FieldInvertState s) { return in.computeNorm(s); }
    public SimWeight computeWeight(CollectionStatistics cs, TermStatistics... ts) {
      return in.computeWeight(cs, ts);
    }
    public SimScorer simScorer(SimWeight w, LeafReaderContext ctx)
        throws java.io.IOException {
      final SimScorer d = in.simScorer(w, ctx);
      return new SimScorer() {
        public float score(int doc, float freq) { return d.score(doc, freq); }
        public float computeSlopFactor(int distance) { return d.computeSlopFactor(distance); }
        public float computePayloadFactor(int doc, int start, int end, BytesRef p) {
          return Float.intBitsToFloat(
              ((p.bytes[p.offset] & 0xFF) << 24) | ((p.bytes[p.offset+1] & 0xFF) << 16)
              | ((p.bytes[p.offset+2] & 0xFF) << 8) | (p.bytes[p.offset+3] & 0xFF));
        }
        public Explanation explain(int doc, Explanation freq) { return d.explain(doc, freq); }
      };
    }
  }

  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    org.apache.lucene.search.similarities.Similarity sim = new PayloadBM25();
    IndexWriterConfig cfg = new IndexWriterConfig(new PayloadWS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    cfg.setSimilarity(sim);
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    s.setSimilarity(sim);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      Query q;
      if (p[0].equals("PAYSCORE")) {
        // PAYSCORE fn includeSpan slop ord t1 t2 ...
        PayloadFunction fn = p[1].equals("avg") ? new AveragePayloadFunction()
            : p[1].equals("min") ? new MinPayloadFunction() : new MaxPayloadFunction();
        boolean inc = p[2].equals("1");
        int slop = Integer.parseInt(p[3]);
        boolean ord = p[4].equals("1");
        SpanQuery sq;
        if (p.length == 6) {
          sq = new SpanTermQuery(new Term("body", p[5]));
        } else {
          SpanQuery[] cls = new SpanQuery[p.length - 5];
          for (int i = 5; i < p.length; i++)
            cls[i - 5] = new SpanTermQuery(new Term("body", p[i]));
          sq = new SpanNearQuery(cls, slop, ord);
        }
        q = new PayloadScoreQuery(sq, fn, inc);
      } else if (p[0].equals("PAYCHECK")) {
        // PAYCHECK slop t1:f1 t2:f2 ... (f = float or 'null')
        int slop = Integer.parseInt(p[1]);
        java.util.List<BytesRef> want = new java.util.ArrayList<>();
        SpanQuery[] cls = new SpanQuery[p.length - 2];
        for (int i = 2; i < p.length; i++) {
          String[] kv = p[i].split(":");
          cls[i - 2] = new SpanTermQuery(new Term("body", kv[0]));
          if (kv[1].equals("null")) { want.add(null); }
          else {
            int bits = Float.floatToIntBits(Float.parseFloat(kv[1]));
            want.add(new BytesRef(new byte[]{(byte)(bits >>> 24), (byte)(bits >>> 16),
                                             (byte)(bits >>> 8), (byte)bits}));
          }
        }
        SpanQuery sq = cls.length == 1 ? cls[0] : new SpanNearQuery(cls, slop, true);
        q = new SpanPayloadCheckQuery(sq, want);
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


SPELL_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.spell.*;

public class GroundTruthSpell {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      StringBuilder out = new StringBuilder();
      if (p[0].equals("DS")) {
        // DS word numSug maxEdits minPrefix accuracy minQueryLength maxQueryFrequency
        DirectSpellChecker ds = new DirectSpellChecker();
        ds.setMaxEdits(Integer.parseInt(p[3]));
        ds.setMinPrefix(Integer.parseInt(p[4]));
        ds.setAccuracy(Float.parseFloat(p[5]));
        ds.setMinQueryLength(Integer.parseInt(p[6]));
        ds.setMaxQueryFrequency(Float.parseFloat(p[7]));
        SuggestWord[] sw = ds.suggestSimilar(
            new org.apache.lucene.index.Term("body", p[1]),
            Integer.parseInt(p[2]),
            r, SuggestMode.SUGGEST_WHEN_NOT_IN_INDEX);
        for (SuggestWord s : sw) {
          if (out.length() > 0) out.append(";");
          out.append(s.string).append(":")
             .append(Float.toString(s.score)).append(":").append(s.freq);
        }
      } else if (p[0].equals("WBB")) {
        // WBB word maxChanges minBreakLength maxEvaluations minSuggestionFrequency
        WordBreakSpellChecker wb = new WordBreakSpellChecker();
        wb.setMaxChanges(Integer.parseInt(p[2]));
        wb.setMinBreakWordLength(Integer.parseInt(p[3]));
        wb.setMaxEvaluations(Integer.parseInt(p[4]));
        wb.setMinSuggestionFrequency(Integer.parseInt(p[5]));
        SuggestWord[][] res = wb.suggestWordBreaks(
            new org.apache.lucene.index.Term("body", p[1]), 10, r,
            SuggestMode.SUGGEST_WHEN_NOT_IN_INDEX,
            WordBreakSpellChecker.BreakSuggestionSortMethod.NUM_CHANGES_THEN_MAX_FREQUENCY);
        for (SuggestWord[] br : res) {
          if (out.length() > 0) out.append(";");
          for (int i = 0; i < br.length; i++) {
            if (i > 0) out.append(",");
            out.append(br[i].string).append(":").append(br[i].freq);
          }
        }
      } else if (p[0].equals("WBC")) {
        // WBC maxChanges minSuggestionFrequency maxEvaluations t1 t2 ...
        WordBreakSpellChecker wb = new WordBreakSpellChecker();
        wb.setMaxChanges(Integer.parseInt(p[1]));
        wb.setMinSuggestionFrequency(Integer.parseInt(p[2]));
        wb.setMaxEvaluations(Integer.parseInt(p[3]));
        org.apache.lucene.index.Term[] terms =
            new org.apache.lucene.index.Term[p.length - 4];
        for (int i = 4; i < p.length; i++)
          terms[i - 4] = new org.apache.lucene.index.Term("body", p[i]);
        CombineSuggestion[] res = wb.suggestWordCombinations(
            terms, 10, r, SuggestMode.SUGGEST_WHEN_NOT_IN_INDEX);
        for (CombineSuggestion cs : res) {
          if (out.length() > 0) out.append(";");
          out.append(cs.suggestion.string).append(":")
             .append(cs.suggestion.freq).append(":");
          for (int i = 0; i < cs.originalTermIndexes.length; i++) {
            if (i > 0) out.append(",");
            out.append(cs.originalTermIndexes[i]);
          }
        }
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


CLASSIFY_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.classification.*;

public class GroundTruthClassify {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType bodyFt = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      // line = "<class> <body tokens...>"
      String line = in.readLine();
      int sp = line.indexOf(' ');
      Document d = new Document();
      d.add(new StringField("cls", line.substring(0, sp), Field.Store.YES));
      d.add(new Field("body", line.substring(sp + 1), bodyFt));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    DirectoryReader r = DirectoryReader.open(dir);
    LeafReader lr = r.leaves().get(0).reader();

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String line = in.readLine().trim();
      ClassificationResult<org.apache.lucene.util.BytesRef> res;
      if (line.startsWith("NB ")) {
        SimpleNaiveBayesClassifier nb = new SimpleNaiveBayesClassifier(
            lr, new GroundTruth.WS(), null, "cls", "body");
        res = nb.assignClass(line.substring(3));
      } else if (line.startsWith("KNN ")) {
        // KNN k minDocFreq minTermFreq # text...
        String[] head = line.split("#", 2);
        String[] p = head[0].trim().split(" ");
        KNearestNeighborClassifier knn = new KNearestNeighborClassifier(
            lr, null, new GroundTruth.WS(), null,
            Integer.parseInt(p[1]), Integer.parseInt(p[2]),
            Integer.parseInt(p[3]), "cls", "body");
        res = knn.assignClass(head[1].trim());
      } else {
        throw new IllegalArgumentException(line);
      }
      if (res == null) {
        System.out.println("-");
      } else {
        System.out.println(res.getAssignedClass().utf8ToString() + ":"
            + Double.toString(res.getScore()));
      }
    }
    r.close();
  }
}
"""


HIGHLIGHT_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.search.postingshighlight.PostingsHighlighter;

public class GroundTruthHighlight {
  // alnum-run tokenizer WITH offsets (StandardTokenizer subset for the
  // [a-z0-9 .] texts this harness indexes)
  static final class AlnumOffsets extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new Tokenizer() {
        final org.apache.lucene.analysis.tokenattributes.CharTermAttribute term =
            addAttribute(org.apache.lucene.analysis.tokenattributes.CharTermAttribute.class);
        final org.apache.lucene.analysis.tokenattributes.OffsetAttribute off =
            addAttribute(org.apache.lucene.analysis.tokenattributes.OffsetAttribute.class);
        String text; int i;
        public boolean incrementToken() throws java.io.IOException {
          if (text == null) {
            StringBuilder sb = new StringBuilder(); int c;
            while ((c = input.read()) != -1) sb.append((char) c);
            text = sb.toString(); i = 0;
          }
          while (i < text.length() && !Character.isLetterOrDigit(text.charAt(i))) i++;
          if (i >= text.length()) return false;
          int start = i;
          while (i < text.length() && Character.isLetterOrDigit(text.charAt(i))) i++;
          clearAttributes();
          term.append(text.substring(start, i).toLowerCase(java.util.Locale.ROOT));
          off.setOffset(start, i);
          return true;
        }
        public void reset() throws java.io.IOException { super.reset(); text = null; }
      };
      return new TokenStreamComponents(t);
    }
  }

  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new AlnumOffsets());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_STORED);
    ft.setIndexOptions(IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS);
    for (int i = 0; i < nDocs; i++) {
      // doc text arrives URL-encoded (may contain '. ' sentence breaks)
      String text = java.net.URLDecoder.decode(in.readLine(), "UTF-8");
      Document d = new Document();
      d.add(new Field("body", text, ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // HL <maxPassages> t1 t2 ...
      String[] p = in.readLine().trim().split(" ");
      int maxPassages = Integer.parseInt(p[1]);
      BooleanQuery.Builder b = new BooleanQuery.Builder();
      for (int i = 2; i < p.length; i++)
        b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
      Query q = b.build();
      TopDocs td = s.search(q, Math.max(1, r.maxDoc()));
      PostingsHighlighter ph = new PostingsHighlighter();
      String[] snips = ph.highlight("body", q, s, td, maxPassages);
      StringBuilder out = new StringBuilder();
      for (int i = 0; i < td.scoreDocs.length; i++) {
        if (out.length() > 0) out.append(";");
        out.append(td.scoreDocs[i].doc).append(":")
           .append(java.net.URLEncoder.encode(
               snips[i] == null ? "" : snips[i], "UTF-8"));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


SPATIAL_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;

public class GroundTruthSpatial {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    for (int i = 0; i < nDocs; i++) {
      String[] p = in.readLine().trim().split(" ");
      double lat = Double.parseDouble(p[0]);
      double lon = Double.parseDouble(p[1]);
      Document d = new Document();
      d.add(new LatLonPoint("pt", lat, lon));
      d.add(new LatLonDocValuesField("pt", lat, lon));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // DIST lat lon radiusMeters k
      // POLY k shell[|hole...]   ring = lat,lon;lat,lon;... (closed)
      String[] p = in.readLine().trim().split(" ");
      if (p[0].equals("POLY")) {
        int k = Integer.parseInt(p[1]);
        String[] rings = p[2].split("\\|");
        double[][] latAr = new double[rings.length][];
        double[][] lonAr = new double[rings.length][];
        for (int ri = 0; ri < rings.length; ri++) {
          String[] vs = rings[ri].split(";");
          latAr[ri] = new double[vs.length];
          lonAr[ri] = new double[vs.length];
          for (int vi = 0; vi < vs.length; vi++) {
            String[] c = vs[vi].split(",");
            latAr[ri][vi] = Double.parseDouble(c[0]);
            lonAr[ri][vi] = Double.parseDouble(c[1]);
          }
        }
        org.apache.lucene.geo.Polygon[] holes =
            new org.apache.lucene.geo.Polygon[rings.length - 1];
        for (int ri = 1; ri < rings.length; ri++) {
          holes[ri - 1] = new org.apache.lucene.geo.Polygon(latAr[ri], lonAr[ri]);
        }
        Query q = LatLonPoint.newPolygonQuery("pt",
            new org.apache.lucene.geo.Polygon(latAr[0], lonAr[0], holes));
        TopDocs td = s.search(q, k, new Sort(SortField.FIELD_DOC));
        StringBuilder out = new StringBuilder();
        for (ScoreDoc sd : td.scoreDocs) {
          if (out.length() > 0) out.append(";");
          out.append(sd.doc);
        }
        System.out.println(out.length() == 0 ? "-" : out.toString());
        continue;
      }
      double lat = Double.parseDouble(p[1]);
      double lon = Double.parseDouble(p[2]);
      double radius = Double.parseDouble(p[3]);
      int k = Integer.parseInt(p[4]);
      Query q = LatLonPoint.newDistanceQuery("pt", lat, lon, radius);
      Sort sort = new Sort(LatLonDocValuesField.newDistanceSort("pt", lat, lon));
      TopFieldDocs td = s.search(q, k, sort);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        FieldDoc fd = (FieldDoc) sd;
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":")
           .append(Double.toString((Double) fd.fields[0]));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


SURROUND_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;

public class GroundTruthSurround {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String qs = java.net.URLDecoder.decode(in.readLine().trim(), "UTF-8");
      String line;
      try {
        org.apache.lucene.queryparser.surround.query.SrndQuery sq =
            org.apache.lucene.queryparser.surround.parser.QueryParser.parse(qs);
        Query q = sq.makeLuceneQueryField("body",
            new org.apache.lucene.queryparser.surround.query.BasicQueryFactory(1024));
        TopDocs td = s.search(q, 10);
        StringBuilder out = new StringBuilder();
        for (ScoreDoc sd : td.scoreDocs) {
          if (out.length() > 0) out.append(";");
          out.append(sd.doc).append(":").append(Float.toString(sd.score));
        }
        line = out.length() == 0 ? "-" : out.toString();
      } catch (org.apache.lucene.queryparser.surround.parser.ParseException e) {
        line = "!PARSE";
      } catch (org.apache.lucene.queryparser.surround.parser.TokenMgrError e) {
        line = "!PARSE";
      } catch (org.apache.lucene.queryparser.surround.query.TooManyBasicQueries e) {
        line = "!TOOMANY";
      }
      System.out.println(line);
    }
    r.close();
  }
}
"""


BLENDEDINFIX_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.search.suggest.InputIterator;
import org.apache.lucene.search.suggest.Lookup;
import org.apache.lucene.search.suggest.analyzing.BlendedInfixSuggester;
import org.apache.lucene.store.*;
import org.apache.lucene.util.BytesRef;

public class GroundTruthBlendedInfix {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int n = Integer.parseInt(in.readLine().trim());
    final String[] texts = new String[n];
    final long[] weights = new long[n];
    for (int i = 0; i < n; i++) {
      String[] p = in.readLine().split("\t", 2);
      weights[i] = Long.parseLong(p[0]);
      texts[i] = java.net.URLDecoder.decode(p[1], "UTF-8");
    }
    InputIterator it = new InputIterator() {
      int i = -1;
      public BytesRef next() {
        i++;
        return i < texts.length ? new BytesRef(texts[i]) : null;
      }
      public long weight() { return weights[i]; }
      public BytesRef payload() { return null; }
      public boolean hasPayloads() { return false; }
      public java.util.Set<BytesRef> contexts() { return null; }
      public boolean hasContexts() { return false; }
    };

    int nQ = Integer.parseInt(in.readLine().trim());
    String[][] qs = new String[nQ][];
    for (int qi = 0; qi < nQ; qi++) qs[qi] = in.readLine().trim().split(" ", 4);

    for (int qi = 0; qi < nQ; qi++) {
      String[] p = qs[qi];
      BlendedInfixSuggester.BlenderType bt =
          p[0].equals("L") ? BlendedInfixSuggester.BlenderType.POSITION_LINEAR
        : p[0].equals("R") ? BlendedInfixSuggester.BlenderType.POSITION_RECIPROCAL
        : BlendedInfixSuggester.BlenderType.POSITION_EXPONENTIAL_RECIPROCAL;
      int num = Integer.parseInt(p[1]);
      boolean allTerms = p[2].equals("1");
      String key = java.net.URLDecoder.decode(p[3], "UTF-8");
      BlendedInfixSuggester sug = new BlendedInfixSuggester(
          new RAMDirectory(), new GroundTruthFVH.WSO(), new GroundTruthFVH.WSO(),
          4, bt, 10, 2.0, false, allTerms, false);
      // fresh iterator per build
      final int[] idx = {-1};
      sug.build(new InputIterator() {
        public BytesRef next() {
          idx[0]++;
          return idx[0] < texts.length ? new BytesRef(texts[idx[0]]) : null;
        }
        public long weight() { return weights[idx[0]]; }
        public BytesRef payload() { return null; }
        public boolean hasPayloads() { return false; }
        public java.util.Set<BytesRef> contexts() { return null; }
        public boolean hasContexts() { return false; }
      });
      java.util.List<Lookup.LookupResult> res =
          sug.lookup(key, (java.util.Set<BytesRef>) null, num, allTerms, false);
      StringBuilder out = new StringBuilder();
      for (Lookup.LookupResult r : res) {
        if (out.length() > 0) out.append(";");
        out.append(Long.toString(r.value)).append(",")
           .append(java.net.URLEncoder.encode(r.key.toString(), "UTF-8"));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
      sug.close();
    }
  }
}
"""


FVH_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.search.vectorhighlight.*;

public class GroundTruthFVH {
  // whitespace tokenizer WITH offsets (GroundTruth.WS lacks them)
  static final class WSO extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new Tokenizer() {
        final org.apache.lucene.analysis.tokenattributes.CharTermAttribute term =
            addAttribute(org.apache.lucene.analysis.tokenattributes.CharTermAttribute.class);
        final org.apache.lucene.analysis.tokenattributes.OffsetAttribute off =
            addAttribute(org.apache.lucene.analysis.tokenattributes.OffsetAttribute.class);
        final org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute pi =
            addAttribute(org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute.class);
        String buf; int idx;
        public boolean incrementToken() throws java.io.IOException {
          if (buf == null) {
            StringBuilder sb = new StringBuilder(); int c;
            while ((c = input.read()) != -1) sb.append((char) c);
            buf = sb.toString(); idx = 0;
          }
          while (idx < buf.length() && buf.charAt(idx) == ' ') idx++;
          if (idx >= buf.length()) return false;
          int start = idx;
          while (idx < buf.length() && buf.charAt(idx) != ' ') idx++;
          clearAttributes();
          pi.setPositionIncrement(1);
          term.append(buf, start, idx);
          off.setOffset(correctOffset(start), correctOffset(idx));
          return true;
        }
        public void end() throws java.io.IOException {
          super.end();
          // the final offset — AnalyzingInfixSuggester's trailing-space
          // detection reads offsetAtt.endOffset() after ts.end()
          int f = correctOffset(buf == null ? 0 : buf.length());
          off.setOffset(f, f);
        }
        public void reset() throws java.io.IOException { super.reset(); buf = null; }
      };
      return new TokenStreamComponents(t);
    }
  }

  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new WSO());
    cfg.setMaxBufferedDocs(1000000);
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_STORED);
    ft.setStoreTermVectors(true);
    ft.setStoreTermVectorPositions(true);
    ft.setStoreTermVectorOffsets(true);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", java.net.URLDecoder.decode(in.readLine().trim(), "UTF-8"), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // "<docId> <phraseHL> <fragSize> <maxNum> <S|W> <clause>|..."
      // clause: t:<boost>:<term>  or  p:<boost>:<slop>:<t1> <t2> ...
      String[] p = in.readLine().trim().split(" ", 6);
      int docId = Integer.parseInt(p[0]);
      boolean phraseHL = p[1].equals("1");
      int fragSize = Integer.parseInt(p[2]);
      int maxNum = Integer.parseInt(p[3]);
      boolean weighted = p[4].equals("W");
      BooleanQuery.Builder b = new BooleanQuery.Builder();
      for (String cl : java.net.URLDecoder.decode(p[5], "UTF-8").split("\\|")) {
        String[] c = cl.split(":", 3);
        Query q;
        if (c[0].equals("t")) {
          q = new TermQuery(new Term("body", c[2]));
        } else {
          String[] sp = c[2].split(":", 2);
          PhraseQuery.Builder pb = new PhraseQuery.Builder();
          for (String t : sp[1].split(" ")) pb.add(new Term("body", t));
          pb.setSlop(Integer.parseInt(sp[0]));
          q = pb.build();
        }
        float boost = Float.parseFloat(c[1]);
        if (boost != 1f) q = new BoostQuery(q, boost);
        b.add(q, BooleanClause.Occur.SHOULD);
      }
      FragListBuilder flb = weighted
          ? new WeightedFragListBuilder() : new SimpleFragListBuilder();
      ScoreOrderFragmentsBuilder fb = new ScoreOrderFragmentsBuilder();
      String line;
      try {
        // FieldQuery's constructor is package-private; the public path
        // is FastVectorHighlighter.getFieldQuery
        FastVectorHighlighter fvh = new FastVectorHighlighter(phraseHL, true, flb, fb);
        FieldQuery fq = fvh.getFieldQuery(b.build(), r);
        FieldTermStack stack = new FieldTermStack(r, docId, "body", fq);
        FieldPhraseList fpl = new FieldPhraseList(stack, fq, Integer.MAX_VALUE);
        FieldFragList ffl = flb.createFieldFragList(fpl, fragSize);
        java.util.List<FieldFragList.WeightedFragInfo> sorted =
            fb.getWeightedFragInfoList(ffl.getFragInfos());
        String[] frags = fb.createFragments(r, docId, "body", ffl, maxNum);
        if (frags == null || frags.length == 0) {
          line = "-";
        } else {
          StringBuilder out = new StringBuilder();
          for (int i = 0; i < frags.length; i++) {
            if (i > 0) out.append(";");
            out.append(Float.toString((float) sorted.get(i).getTotalBoost()))
               .append(",").append(java.net.URLEncoder.encode(frags[i], "UTF-8"));
          }
          line = out.toString();
        }
      } catch (IllegalArgumentException e) {
        line = "!ERR";
      }
      System.out.println(line);
    }
    r.close();
  }
}
"""


FACETASSOC_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.facet.*;
import org.apache.lucene.facet.taxonomy.*;
import org.apache.lucene.facet.taxonomy.directory.*;

public class GroundTruthFacetAssoc {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    Directory dir = new RAMDirectory();
    Directory tdir = new RAMDirectory();
    FacetsConfig config = new FacetsConfig();
    config.setMultiValued("idim", true);
    config.setIndexFieldName("idim", "$ia");
    config.setMultiValued("fdim", true);
    config.setIndexFieldName("fdim", "$fa");
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(1000000);
    IndexWriter w = new IndexWriter(dir, cfg);
    DirectoryTaxonomyWriter tw = new DirectoryTaxonomyWriter(tdir);
    int nDocs = Integer.parseInt(in.readLine().trim());
    for (int i = 0; i < nDocs; i++) {
      String[] p = in.readLine().split("\t", 2);
      Document d = new Document();
      d.add(new StringField("f", p[0], Field.Store.NO));
      if (p.length > 1 && !p[1].isEmpty()) {
        for (String spec : p[1].split(",")) {
          String[] q = spec.split("/");
          if (q[0].equals("idim")) {
            d.add(new IntAssociationFacetField(Integer.parseInt(q[2]), "idim", q[1]));
          } else {
            d.add(new FloatAssociationFacetField(Float.parseFloat(q[2]), "fdim", q[1]));
          }
        }
      }
      w.addDocument(config.build(tw, d));
    }
    w.forceMerge(1);
    w.close();
    tw.close();
    IndexReader r = DirectoryReader.open(dir);
    TaxonomyReader tr = new DirectoryTaxonomyReader(tdir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      int topN = Integer.parseInt(p[1]);
      FacetsCollector fc = new FacetsCollector();
      s.search(new TermQuery(new Term("f", "m")), fc);
      Facets facets;
      String dim;
      if (p[0].equals("INT")) {
        facets = new TaxonomyFacetSumIntAssociations("$ia", tr, config, fc);
        dim = "idim";
      } else {
        facets = new TaxonomyFacetSumFloatAssociations("$fa", tr, config, fc);
        dim = "fdim";
      }
      FacetResult res = facets.getTopChildren(topN, dim);
      if (res == null) {
        System.out.println("-");
        continue;
      }
      StringBuilder out = new StringBuilder();
      for (LabelAndValue lv : res.labelValues) {
        if (out.length() > 0) out.append(";");
        out.append(lv.label).append(":").append(
            p[0].equals("INT") ? Integer.toString(lv.value.intValue())
                               : Float.toString(lv.value.floatValue()));
      }
      out.append("|").append(res.childCount);
      System.out.println(out.toString());
    }
    r.close();
    tr.close();
  }
}
"""


JOINUTIL_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.util.BytesRef;

public class GroundTruthJoinUtil {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    // FROM docs first (ids 0..nFrom-1): "key<TAB>body terms"; then TO
    // docs (ids nFrom..): "key" only (no body)
    int nFrom = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(1000000);
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nFrom; i++) {
      String[] p = in.readLine().split("\t", 2);
      Document d = new Document();
      d.add(new BinaryDocValuesField("from_k", new BytesRef(p[0])));
      d.add(new Field("body", p[1], ft));
      w.addDocument(d);
    }
    int nTo = Integer.parseInt(in.readLine().trim());
    for (int i = 0; i < nTo; i++) {
      Document d = new Document();
      d.add(new StringField("to_k", in.readLine().trim(), Field.Store.NO));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // "<mode> t1 t2 ..."
      String[] p = in.readLine().trim().split(" ");
      org.apache.lucene.search.join.ScoreMode sm =
          org.apache.lucene.search.join.ScoreMode.valueOf(
              p[0].substring(0, 1).toUpperCase() + p[0].substring(1));
      BooleanQuery.Builder b = new BooleanQuery.Builder();
      for (int i = 1; i < p.length; i++)
        b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
      Query jq = org.apache.lucene.search.join.JoinUtil.createJoinQuery(
          "from_k", false, "to_k", b.build(), s, sm);
      TopDocs td = s.search(jq, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


DATEMATH_JAVA = r"""
public class GroundTruthDateMath {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int n = Integer.parseInt(in.readLine().trim());
    for (int i = 0; i < n; i++) {
      String[] parts = in.readLine().split(";", 4);
      String mode = parts[0];
      String tz = parts[1];
      long now = Long.parseLong(parts[2]);
      String val = java.net.URLDecoder.decode(parts[3], "UTF-8");
      String out;
      try {
        java.util.Date res;
        if (mode.equals("S")) {
          // static parseMath(Date, String): full NOW.../date-Z-math form
          res = org.apache.solr.util.DateMathParser.parseMath(
              new java.util.Date(now), val);
        } else {
          org.apache.solr.util.DateMathParser p =
              new org.apache.solr.util.DateMathParser(
                  java.util.TimeZone.getTimeZone(tz));
          p.setNow(new java.util.Date(now));
          res = p.parseMath(val);
        }
        out = Long.toString(res.getTime());
      } catch (java.text.ParseException e) {
        out = "!PARSE";
      } catch (IllegalArgumentException e) {
        out = "!ERR";
      }
      System.out.println(out);
    }
  }
}
"""


FREETEXT_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.search.suggest.InputIterator;
import org.apache.lucene.search.suggest.Lookup;
import org.apache.lucene.search.suggest.analyzing.FreeTextSuggester;
import org.apache.lucene.util.BytesRef;

public class GroundTruthFreeText {
  // whitespace analyzer WITH offsets + end()-final-offset — the lookup
  // path needs them for the trailing-space "lastTokenEnded" upgrade
  // (FreeTextSuggester.java:527-546); GroundTruth.WS sets no offsets.
  static final class WSOff extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new Tokenizer() {
        final org.apache.lucene.analysis.tokenattributes.CharTermAttribute term =
            addAttribute(org.apache.lucene.analysis.tokenattributes.CharTermAttribute.class);
        final org.apache.lucene.analysis.tokenattributes.OffsetAttribute off =
            addAttribute(org.apache.lucene.analysis.tokenattributes.OffsetAttribute.class);
        String buf; int pos;
        public boolean incrementToken() throws java.io.IOException {
          if (buf == null) {
            StringBuilder sb = new StringBuilder(); int c;
            while ((c = input.read()) != -1) sb.append((char) c);
            buf = sb.toString(); pos = 0;
          }
          while (pos < buf.length() && Character.isWhitespace(buf.charAt(pos))) pos++;
          if (pos >= buf.length()) return false;
          int start = pos;
          while (pos < buf.length() && !Character.isWhitespace(buf.charAt(pos))) pos++;
          clearAttributes();
          term.append(buf, start, pos);
          off.setOffset(correctOffset(start), correctOffset(pos));
          return true;
        }
        public void end() throws java.io.IOException {
          super.end();
          int fin = correctOffset(buf == null ? 0 : buf.length());
          off.setOffset(fin, fin);
        }
        public void reset() throws java.io.IOException { super.reset(); buf = null; }
      };
      return new TokenStreamComponents(t);
    }
  }

  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    final java.util.List<String> docs = new java.util.ArrayList<>();
    for (int i = 0; i < nDocs; i++) docs.add(in.readLine());
    FreeTextSuggester sug =
        new FreeTextSuggester(new WSOff(), new WSOff(), 2, (byte) 0x1e);
    final java.util.Iterator<String> it = docs.iterator();
    sug.build(new InputIterator() {
      public BytesRef next() { return it.hasNext() ? new BytesRef(it.next()) : null; }
      public long weight() { return 1; }
      public BytesRef payload() { return null; }
      public boolean hasPayloads() { return false; }
      public java.util.Set<BytesRef> contexts() { return null; }
      public boolean hasContexts() { return false; }
    });

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // "num <url-encoded key>" (encoding preserves trailing spaces)
      String[] p = in.readLine().trim().split(" ", 2);
      int num = Integer.parseInt(p[0]);
      String key = java.net.URLDecoder.decode(p[1], "UTF-8");
      StringBuilder out = new StringBuilder();
      try {
        for (Lookup.LookupResult r : sug.lookup(key, num)) {
          if (out.length() > 0) out.append(";");
          // keys may contain the 0x1e separator byte — encode
          out.append(java.net.URLEncoder.encode((String) r.key, "UTF-8"))
             .append(":").append(r.value);
        }
      } catch (IllegalArgumentException e) {
        out.append("!err");
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
  }
}
"""


SUGGESTERS_JAVA = r"""
import org.apache.lucene.search.suggest.InputIterator;
import org.apache.lucene.search.suggest.Lookup;
import org.apache.lucene.store.RAMDirectory;
import org.apache.lucene.util.BytesRef;

public class GroundTruthSuggesters {
  static InputIterator iter(final java.util.List<String> keys,
                            final java.util.List<Long> weights) {
    return new InputIterator() {
      int i = -1;
      public BytesRef next() {
        i++;
        return i < keys.size() ? new BytesRef(keys.get(i)) : null;
      }
      public long weight() { return weights.get(i); }
      public BytesRef payload() { return null; }
      public boolean hasPayloads() { return false; }
      public java.util.Set<BytesRef> contexts() { return null; }
      public boolean hasContexts() { return false; }
    };
  }

  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int n = Integer.parseInt(in.readLine().trim());
    final java.util.List<String> keys = new java.util.ArrayList<>();
    final java.util.List<Long> weights = new java.util.ArrayList<>();
    for (int i = 0; i < n; i++) {
      String[] p = in.readLine().trim().split(" ", 2);
      weights.add(Long.parseLong(p[0]));
      keys.add(java.net.URLDecoder.decode(p[1], "UTF-8"));
    }
    java.util.Map<String, Lookup> built = new java.util.HashMap<>();

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ", 3);
      String kind = p[0];
      int num = Integer.parseInt(p[1]);
      String key = java.net.URLDecoder.decode(p[2], "UTF-8");
      String family = kind.startsWith("FSTB") ? "FSTB"
                    : kind.equals("WFSTNX") ? "WFSTNX"
                    : kind.equals("TSTW") ? "TST"
                    : kind.equals("JASPELLW") ? "JASPELL"
                    : kind.equals("ANALYZINGNX") ? "ANALYZINGNX" : kind;
      Lookup lk = built.get(family);
      if (lk == null) {
        if (family.equals("WFST")) {
          lk = new org.apache.lucene.search.suggest.fst.WFSTCompletionLookup(
              new RAMDirectory(), "wfst", true);
        } else if (family.equals("WFSTNX")) {
          lk = new org.apache.lucene.search.suggest.fst.WFSTCompletionLookup(
              new RAMDirectory(), "wfstnx", false);
        } else if (family.equals("FSTB")) {
          lk = new org.apache.lucene.search.suggest.fst.FSTCompletionLookup(
              new RAMDirectory(), "fstb");
        } else if (family.equals("ANALYZING")) {
          lk = new org.apache.lucene.search.suggest.analyzing.AnalyzingSuggester(
              new RAMDirectory(), "an",
              new GroundTruthFreeText.WSOff(), new GroundTruthFreeText.WSOff());
        } else if (family.equals("ANALYZINGNX")) {
          // PRESERVE_SEP only (no EXACT_FIRST)
          lk = new org.apache.lucene.search.suggest.analyzing.AnalyzingSuggester(
              new RAMDirectory(), "annx",
              new GroundTruthFreeText.WSOff(), new GroundTruthFreeText.WSOff(),
              org.apache.lucene.search.suggest.analyzing.AnalyzingSuggester.PRESERVE_SEP,
              256, -1, true);
        } else if (family.equals("TST")) {
          lk = new org.apache.lucene.search.suggest.tst.TSTLookup(
              new RAMDirectory(), "tst");
        } else if (family.equals("JASPELL")) {
          lk = new org.apache.lucene.search.suggest.jaspell.JaspellLookup();
        } else if (family.equals("FUZZY")) {
          lk = new org.apache.lucene.search.suggest.analyzing.FuzzySuggester(
              new RAMDirectory(), "fz",
              new GroundTruthFreeText.WSOff(), new GroundTruthFreeText.WSOff());
        } else {
          throw new IllegalArgumentException(kind);
        }
        lk.build(iter(keys, weights));
        built.put(family, lk);
      }
      // FSTBW = onlyMorePopular=true (the weighted-order path);
      // everything else uses the standard lookup
      boolean omp = kind.equals("FSTBW") || kind.equals("TSTW")
          || kind.equals("JASPELLW");
      StringBuilder out = new StringBuilder();
      for (Lookup.LookupResult r : lk.lookup(key, omp, num)) {
        if (out.length() > 0) out.append(";");
        out.append(java.net.URLEncoder.encode(r.key.toString(), "UTF-8"))
           .append(":").append(r.value);
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
  }
}
"""


COMPLEX_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.queryparser.complexPhrase.ComplexPhraseQueryParser;

public class GroundTruthComplex {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // raw query string (URL-encoded; usually a quoted complex phrase).
      // An "U " prefix BEFORE the encoded string selects
      // setInOrder(false) — the parser's unordered proximity mode.
      String raw = in.readLine().trim();
      boolean inOrder = true;
      if (raw.startsWith("U ")) { inOrder = false; raw = raw.substring(2); }
      String qs = java.net.URLDecoder.decode(raw, "UTF-8");
      ComplexPhraseQueryParser p =
          new ComplexPhraseQueryParser("body", new GroundTruth.WS());
      p.setInOrder(inOrder);
      Query q = p.parse(qs);
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


FACET_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.facet.*;
import org.apache.lucene.facet.sortedset.*;

public class GroundTruthFacet {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FacetsConfig fc = new FacetsConfig();
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      // line = "<dimvalue> <body tokens...>"
      String[] parts = in.readLine().split(" ", 2);
      Document d = new Document();
      d.add(new SortedSetDocValuesFacetField("dim", parts[0]));
      d.add(new Field("body", parts[1], ft));
      w.addDocument(fc.build(d));
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    SortedSetDocValuesReaderState state =
        new DefaultSortedSetDocValuesReaderState(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // FACET <topN> t1 t2 ...
      String[] p = in.readLine().trim().split(" ");
      int topN = Integer.parseInt(p[1]);
      BooleanQuery.Builder b = new BooleanQuery.Builder();
      for (int i = 2; i < p.length; i++)
        b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
      FacetsCollector fcoll = new FacetsCollector();
      FacetsCollector.search(s, b.build(), 10, fcoll);
      Facets facets = new SortedSetDocValuesFacetCounts(state, fcoll);
      FacetResult res = facets.getTopChildren(topN, "dim");
      StringBuilder out = new StringBuilder();
      if (res != null) {
        for (LabelAndValue lv : res.labelValues) {
          if (out.length() > 0) out.append(";");
          out.append(lv.label).append(":").append(lv.value);
        }
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


PORTER_JAVA = r"""
import org.apache.lucene.analysis.*;
import org.apache.lucene.analysis.en.PorterStemFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;

public class GroundTruthPorter {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    while ((line = in.readLine()) != null) {
      if (line.isEmpty()) continue;
      Tokenizer t = new Tokenizer() {
        final CharTermAttribute term = addAttribute(CharTermAttribute.class);
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
          clearAttributes(); term.append(toks.get(i++)); return true;
        }
        public void reset() throws java.io.IOException { super.reset(); toks = null; }
      };
      t.setReader(new java.io.StringReader(line));
      TokenStream ts = new PorterStemFilter(t);
      CharTermAttribute term = ts.getAttribute(CharTermAttribute.class);
      ts.reset();
      StringBuilder out = new StringBuilder();
      while (ts.incrementToken()) {
        if (out.length() > 0) out.append(" ");
        out.append(term.toString());
      }
      ts.end(); ts.close();
      System.out.println(out.toString());
    }
  }
}
"""


JOIN_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.search.join.*;

public class GroundTruthJoin {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nBlocks = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(1000000);
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int bi = 0; bi < nBlocks; bi++) {
      int nChildren = Integer.parseInt(in.readLine().trim());
      java.util.List<Document> block = new java.util.ArrayList<>();
      for (int ci = 0; ci < nChildren; ci++) {
        Document c = new Document();
        c.add(new Field("body", in.readLine(), ft));
        block.add(c);
      }
      Document p = new Document();  // parent LAST (addDocuments contract)
      p.add(new StringField("type", "p", Field.Store.NO));
      p.add(new Field("body", in.readLine(), ft));
      block.add(p);
      w.addDocuments(block);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);
    BitSetProducer parents =
        new QueryBitSetProducer(new TermQuery(new Term("type", "p")));

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      Query q;
      BooleanQuery.Builder b = new BooleanQuery.Builder();
      for (int i = 2; i < p.length; i++)
        b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
      if (p[0].equals("TOPARENT")) {
        // TOPARENT <none|avg|max|total> t1 t2 ...
        ScoreMode sm = ScoreMode.valueOf(
            p[1].substring(0, 1).toUpperCase() + p[1].substring(1));
        q = new ToParentBlockJoinQuery(b.build(), parents, sm);
      } else if (p[0].equals("TOCHILD")) {
        q = new ToChildBlockJoinQuery(b.build(), parents);
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


MEMORY_JAVA = r"""
import org.apache.lucene.index.*;
import org.apache.lucene.index.memory.MemoryIndex;
import org.apache.lucene.search.*;

public class GroundTruthMemory {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // line = "<spec>#<doc text>"; spec = TERM t | OR t.. | AND t.. |
      // PHRASE slop t.. (same shapes as the TOPK harness)
      String line = in.readLine();
      int hash = line.indexOf('#');
      String[] p = line.substring(0, hash).trim().split(" ");
      String doc = line.substring(hash + 1);
      MemoryIndex mi = new MemoryIndex();
      mi.addField("body", doc, new GroundTruth.WS());
      Query q;
      if (p[0].equals("TERM")) {
        q = new TermQuery(new Term("body", p[1]));
      } else if (p[0].equals("OR") || p[0].equals("AND")) {
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 1; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])),
                p[0].equals("AND") ? BooleanClause.Occur.MUST
                                   : BooleanClause.Occur.SHOULD);
        q = b.build();
      } else if (p[0].equals("PHRASE")) {
        int slop = Integer.parseInt(p[1]);
        PhraseQuery.Builder b = new PhraseQuery.Builder();
        b.setSlop(slop);
        for (int i = 2; i < p.length; i++) b.add(new Term("body", p[i]), i - 2);
        q = b.build();
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      System.out.println(Float.toString(mi.search(q)));
    }
  }
}
"""


GROUP_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.*;
import org.apache.lucene.search.grouping.*;
import org.apache.lucene.util.BytesRef;

public class GroundTruthGroup {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      // line = "<group> <key> <body tokens...>"
      String[] parts = in.readLine().split(" ", 3);
      Document d = new Document();
      d.add(new SortedDocValuesField("grp", new BytesRef(parts[0])));
      d.add(new StringField("grpt", parts[0], Field.Store.NO));
      d.add(new NumericDocValuesField("key", Long.parseLong(parts[1])));
      d.add(new Field("body", parts[2], ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      StringBuilder out = new StringBuilder();
      if (p[0].equals("GROUP")) {
        // GROUP nGroups nWithin t1 t2 ... (OR query, relevance sorts)
        int nGroups = Integer.parseInt(p[1]);
        int nWithin = Integer.parseInt(p[2]);
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 3; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        GroupingSearch gs = new GroupingSearch("grp");
        gs.setGroupDocsLimit(nWithin);
        gs.setIncludeScores(true);
        gs.setIncludeMaxScore(true);
        TopGroups<BytesRef> tg = gs.search(s, b.build(), 0, nGroups);
        for (GroupDocs<BytesRef> g : tg.groups) {
          if (out.length() > 0) out.append(";");
          out.append(g.groupValue == null ? "_" : g.groupValue.utf8ToString());
          out.append("|").append(Float.toString(g.maxScore)).append("|");
          for (int i = 0; i < g.scoreDocs.length; i++) {
            if (i > 0) out.append(",");
            out.append(g.scoreDocs[i].doc).append(":")
               .append(Float.toString(g.scoreDocs[i].score));
          }
        }
      } else if (p[0].equals("JOINQ")) {
        // JOINQ <none|avg|max|total> t1 t2 ... -> JoinUtil.createJoinQuery
        //   (from grp sorted-dv, to grpt indexed term; self-join)
        org.apache.lucene.search.join.ScoreMode sm =
            org.apache.lucene.search.join.ScoreMode.valueOf(
                p[1].substring(0, 1).toUpperCase() + p[1].substring(1));
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 2; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        Query jq = org.apache.lucene.search.join.JoinUtil.createJoinQuery(
            "grp", false, "grpt", b.build(), s, sm);
        TopDocs td = s.search(jq, 10);
        for (ScoreDoc sd : td.scoreDocs) {
          if (out.length() > 0) out.append(";");
          out.append(sd.doc).append(":").append(Float.toString(sd.score));
        }
      } else if (p[0].equals("CUSTOM")) {
        // CUSTOM t1 t2 ... -> CustomScoreQuery(OR(terms),
        //   FunctionQuery(LongFieldSource("key"))) top-10
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 1; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        org.apache.lucene.queries.CustomScoreQuery cq =
            new org.apache.lucene.queries.CustomScoreQuery(
                b.build(),
                new org.apache.lucene.queries.function.FunctionQuery(
                    new org.apache.lucene.queries.function.valuesource
                        .LongFieldSource("key")));
        TopDocs td = s.search(cq, 10);
        for (ScoreDoc sd : td.scoreDocs) {
          if (out.length() > 0) out.append(";");
          out.append(sd.doc).append(":").append(Float.toString(sd.score));
        }
      } else if (p[0].equals("DIV")) {
        // DIV k maxPerKey t1 t2 ... (OR query)
        int k = Integer.parseInt(p[1]);
        int maxPerKey = Integer.parseInt(p[2]);
        BooleanQuery.Builder b = new BooleanQuery.Builder();
        for (int i = 3; i < p.length; i++)
          b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
        DiversifiedTopDocsCollector c =
            new DiversifiedTopDocsCollector(k, maxPerKey) {
          @Override
          protected NumericDocValues getKeys(
              org.apache.lucene.index.LeafReaderContext context) {
            try {
              return DocValues.getNumeric(context.reader(), "key");
            } catch (java.io.IOException e) {
              throw new RuntimeException(e);
            }
          }
        };
        s.search(b.build(), c);
        TopDocs td = c.topDocs();
        for (ScoreDoc sd : td.scoreDocs) {
          if (out.length() > 0) out.append(";");
          out.append(sd.doc).append(":").append(Float.toString(sd.score));
        }
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


GROUP2_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.util.BytesRef;
import org.apache.lucene.search.grouping.*;
import org.apache.lucene.search.grouping.term.*;

/** Ground truth for the REST of lucene/grouping (AllGroups, AllGroupHeads,
 *  DistinctValues, GroupFacet SV+MV, BlockGroupingCollector) plus the
 *  join module's global-ordinals JoinUtil path (occurrence min/max).
 *
 *  Corpus line: "<group|_> <key> <facetCSV|_> <body tokens...>".
 *  grp  = SortedDocValues (absent when _)
 *  key  = NumericDocValues
 *  fs   = SortedDocValues, FIRST facet value (absent when _)
 *  fm   = SortedSetDocValues, ALL facet values
 *  orig = NumericDocValues original position (for the block index) */
public class GroundTruthGroup2 {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    String[][] raw = new String[nDocs][];
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      String[] parts = in.readLine().split(" ", 4);
      raw[i] = parts;
      Document d = new Document();
      if (!parts[0].equals("_"))
        d.add(new SortedDocValuesField("grp", new BytesRef(parts[0])));
      d.add(new NumericDocValuesField("key", Long.parseLong(parts[1])));
      d.add(new NumericDocValuesField("orig", i));
      if (!parts[2].equals("_")) {
        String[] fv = parts[2].split(",");
        d.add(new SortedDocValuesField("fs", new BytesRef(fv[0])));
        for (String v : fv)
          d.add(new SortedSetDocValuesField("fm", new BytesRef(v)));
      }
      d.add(new Field("body", parts[3], ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    // block index: same docs regrouped into contiguous blocks per group
    // (groups in first-appearance order, docs in corpus order, null-group
    // docs under the "_" pseudo group), last doc per block marked.
    Directory bdir = new RAMDirectory();
    IndexWriterConfig bcfg = new IndexWriterConfig(new GroundTruth.WS());
    bcfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter bw = new IndexWriter(bdir, bcfg);
    java.util.LinkedHashMap<String, java.util.List<Integer>> byGroup =
        new java.util.LinkedHashMap<>();
    for (int i = 0; i < nDocs; i++)
      byGroup.computeIfAbsent(raw[i][0], k -> new java.util.ArrayList<>()).add(i);
    for (java.util.Map.Entry<String, java.util.List<Integer>> e : byGroup.entrySet()) {
      java.util.List<Document> block = new java.util.ArrayList<>();
      java.util.List<Integer> members = e.getValue();
      for (int j = 0; j < members.size(); j++) {
        int i = members.get(j);
        Document d = new Document();
        d.add(new NumericDocValuesField("orig", i));
        d.add(new Field("body", raw[i][3], ft));
        if (j == members.size() - 1)
          d.add(new StringField("groupEnd", "x", Field.Store.NO));
        block.add(d);
      }
      bw.addDocuments(block);
    }
    bw.forceMerge(1);
    bw.close();
    IndexReader br = DirectoryReader.open(bdir);
    IndexSearcher bs = new IndexSearcher(br);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      StringBuilder out = new StringBuilder();
      if (p[0].equals("ALLGROUPS")) {
        // ALLGROUPS t1 t2... -> groups in first-encounter order, _ = null
        TermAllGroupsCollector c = new TermAllGroupsCollector("grp");
        s.search(orQuery(p, 1), c);
        for (BytesRef g : c.getGroups()) {
          if (out.length() > 0) out.append(";");
          out.append(g == null ? "_" : g.utf8ToString());
        }
      } else if (p[0].equals("HEADS")) {
        // HEADS score|key|keyrev t1 t2... -> head docids ASC
        Sort sort = p[1].equals("score") ? Sort.RELEVANCE
            : new Sort(new SortField("key", SortField.Type.LONG,
                                     p[1].equals("keyrev")));
        AbstractAllGroupHeadsCollector<?> c =
            TermAllGroupHeadsCollector.create("grp", sort);
        s.search(orQuery(p, 2), c);
        int[] heads = c.retrieveGroupHeads();
        java.util.Arrays.sort(heads);
        for (int h : heads) {
          if (out.length() > 0) out.append(",");
          out.append(h);
        }
      } else if (p[0].equals("DISTINCT")) {
        // DISTINCT nGroups t1 t2... -> per first-pass group (relevance
        // order): grp|v1,v2 (values sorted, null first as _)
        int nGroups = Integer.parseInt(p[1]);
        Query q = orQuery(p, 2);
        TermFirstPassGroupingCollector fp =
            new TermFirstPassGroupingCollector("grp", Sort.RELEVANCE, nGroups);
        s.search(q, fp);
        java.util.Collection<SearchGroup<BytesRef>> top =
            fp.getTopGroups(0, true);
        if (top != null) {
          TermDistinctValuesCollector dv =
              new TermDistinctValuesCollector("grp", "fs", top);
          s.search(q, dv);
          for (TermDistinctValuesCollector.GroupCount gc : dv.getGroups()) {
            if (out.length() > 0) out.append(";");
            out.append(gc.groupValue == null ? "_"
                       : gc.groupValue.utf8ToString()).append("|");
            java.util.List<String> vals = new java.util.ArrayList<>();
            for (BytesRef v : gc.uniqueValues)
              vals.add(v == null ? "_" : v.utf8ToString());
            java.util.Collections.sort(vals);
            out.append(String.join(",", vals));
          }
        }
      } else if (p[0].equals("GFACET")) {
        // GFACET sv|mv size minCount count|index prefix|- t1 t2...
        //   -> total|missing|v1:c1,v2:c2,...
        boolean mv = p[1].equals("mv");
        int size = Integer.parseInt(p[2]);
        int minCount = Integer.parseInt(p[3]);
        boolean byCount = p[4].equals("count");
        BytesRef prefix = p[5].equals("-") ? null : new BytesRef(p[5]);
        TermGroupFacetCollector c =
            TermGroupFacetCollector.createTermGroupFacetCollector(
                "grp", mv ? "fm" : "fs", mv, prefix, 16);
        s.search(orQuery(p, 6), c);
        AbstractGroupFacetCollector.GroupedFacetResult res =
            c.mergeSegmentResults(size, minCount, byCount);
        out.append(res.getTotalCount()).append("|")
           .append(res.getTotalMissingCount()).append("|");
        java.util.List<AbstractGroupFacetCollector.FacetEntry> entries =
            res.getFacetEntries(0, size);
        for (int i = 0; i < entries.size(); i++) {
          if (i > 0) out.append(",");
          out.append(entries.get(i).getValue().utf8ToString())
             .append(":").append(entries.get(i).getCount());
        }
      } else if (p[0].equals("BLOCK")) {
        // BLOCK nGroups nWithin t1 t2... over the block index ->
        //   orig:score,orig:score;... per group (relevance group sort),
        //   groups separated by ';', maxScore prefix per group
        int nGroups = Integer.parseInt(p[1]);
        int nWithin = Integer.parseInt(p[2]);
        Weight lastDoc = bs.createNormalizedWeight(
            new TermQuery(new Term("groupEnd", "x")), false);
        BlockGroupingCollector c =
            new BlockGroupingCollector(Sort.RELEVANCE, nGroups, true, lastDoc);
        bs.search(orQuery(p, 3), c);
        TopGroups<?> tg = c.getTopGroups(Sort.RELEVANCE, 0, 0, nWithin, false);
        if (tg != null) {
          NumericDocValues orig = MultiDocValues.getNumericValues(br, "orig");
          for (GroupDocs<?> g : tg.groups) {
            if (out.length() > 0) out.append(";");
            out.append(Float.toString(g.maxScore)).append("|");
            for (int i = 0; i < g.scoreDocs.length; i++) {
              if (i > 0) out.append(",");
              out.append(orig.get(g.scoreDocs[i].doc)).append(":")
                 .append(Float.toString(g.scoreDocs[i].score));
            }
          }
        }
      } else if (p[0].equals("DVTERMS") || p[0].equals("DVNUM")
                 || p[0].equals("DVRANGE") || p[0].equals("DVRANGEB")) {
        // sandbox doc-values queries over this corpus's dv fields:
        //   DVTERMS g1 g2...              (grp SORTED)
        //   DVNUM k1 k2...                (key NUMERIC)
        //   DVRANGE lo|* hi|* incLo incHi (key, newLongRange)
        //   DVRANGEB lo|* hi|* incLo incHi (fm SORTED_SET, newBytesRefRange)
        Query q;
        if (p[0].equals("DVTERMS")) {
          org.apache.lucene.util.BytesRef[] ts =
              new org.apache.lucene.util.BytesRef[p.length - 1];
          for (int i = 1; i < p.length; i++)
            ts[i - 1] = new org.apache.lucene.util.BytesRef(p[i]);
          q = new DocValuesTermsQuery("grp", ts);
        } else if (p[0].equals("DVNUM")) {
          Long[] ks = new Long[p.length - 1];
          for (int i = 1; i < p.length; i++) ks[i - 1] = Long.parseLong(p[i]);
          q = new DocValuesNumbersQuery("key", ks);
        } else if (p[0].equals("DVRANGE")) {
          Long lo = p[1].equals("*") ? null : Long.parseLong(p[1]);
          Long hi = p[2].equals("*") ? null : Long.parseLong(p[2]);
          q = DocValuesRangeQuery.newLongRange(
              "key", lo, hi, p[3].equals("1"), p[4].equals("1"));
        } else {
          org.apache.lucene.util.BytesRef lo = p[1].equals("*") ? null
              : new org.apache.lucene.util.BytesRef(p[1]);
          org.apache.lucene.util.BytesRef hi = p[2].equals("*") ? null
              : new org.apache.lucene.util.BytesRef(p[2]);
          q = DocValuesRangeQuery.newBytesRefRange(
              "fm", lo, hi, p[3].equals("1"), p[4].equals("1"));
        }
        TopDocs td = s.search(q, Math.max(1, nDocs));
        int[] ids = new int[td.scoreDocs.length];
        for (int i = 0; i < ids.length; i++) ids[i] = td.scoreDocs[i].doc;
        java.util.Arrays.sort(ids);
        for (int id : ids) {
          if (out.length() > 0) out.append(",");
          out.append(id);
        }
      } else if (p[0].equals("GJOIN")) {
        // GJOIN none|min|max|total|avg minOcc maxOcc t1 t2... ->
        //   global-ordinals JoinUtil (toQuery = MatchAllDocs), top-10
        org.apache.lucene.search.join.ScoreMode sm =
            org.apache.lucene.search.join.ScoreMode.valueOf(
                p[1].substring(0, 1).toUpperCase() + p[1].substring(1));
        int minOcc = Integer.parseInt(p[2]);
        int maxOcc = p[3].equals("inf") ? Integer.MAX_VALUE
                                        : Integer.parseInt(p[3]);
        Query jq = org.apache.lucene.search.join.JoinUtil.createJoinQuery(
            "grp", orQuery(p, 4), new MatchAllDocsQuery(), s, sm, null,
            minOcc, maxOcc);
        TopDocs td = s.search(jq, 10);
        for (ScoreDoc sd : td.scoreDocs) {
          if (out.length() > 0) out.append(";");
          out.append(sd.doc).append(":").append(Float.toString(sd.score));
        }
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
    br.close();
  }

  static Query orQuery(String[] p, int start) {
    BooleanQuery.Builder b = new BooleanQuery.Builder();
    for (int i = start; i < p.length; i++)
      b.add(new TermQuery(new Term("body", p[i])), BooleanClause.Occur.SHOULD);
    return b.build();
  }
}
"""


GEO3D_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.spatial3d.Geo3DPoint;

/** Geo3D distance query ground truth: docs 'lat lon' (degrees) indexed
 *  as Geo3DPoint (WGS84); query 'CIRCLE lat lon radiusMeters' ->
 *  Geo3DPoint.newDistanceQuery, output matching docids ASC. */
public class GroundTruthGeo3D {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    for (int i = 0; i < nDocs; i++) {
      String[] p = in.readLine().trim().split(" ");
      Document d = new Document();
      d.add(new Geo3DPoint("p", Double.parseDouble(p[0]),
                           Double.parseDouble(p[1])));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      Query q;
      if (p[0].equals("PATH")) {
        // PATH widthMeters lat1 lon1 lat2 lon2 ...
        int n = (p.length - 2) / 2;
        double[] lats = new double[n];
        double[] lons = new double[n];
        for (int i = 0; i < n; i++) {
          lats[i] = Double.parseDouble(p[2 + 2 * i]);
          lons[i] = Double.parseDouble(p[3 + 2 * i]);
        }
        q = Geo3DPoint.newPathQuery("p", lats, lons,
                                    Double.parseDouble(p[1]));
      } else if (p[0].equals("BOX")) {
        // BOX minLat maxLat minLon maxLon
        q = Geo3DPoint.newBoxQuery(
            "p", Double.parseDouble(p[1]), Double.parseDouble(p[2]),
            Double.parseDouble(p[3]), Double.parseDouble(p[4]));
      } else if (p[0].equals("POLY")) {
        // POLY lat1 lon1 lat2 lon2 ... [| lat1 lon1 ...] — composite of
        // convex rings; rings are auto-closed (first point appended)
        String spec = String.join(" ",
            java.util.Arrays.copyOfRange(p, 1, p.length));
        String[] ringSpecs = spec.split("\\|");
        org.apache.lucene.geo.Polygon[] polys =
            new org.apache.lucene.geo.Polygon[ringSpecs.length];
        for (int ri = 0; ri < ringSpecs.length; ri++) {
          String[] c = ringSpecs[ri].trim().split(" ");
          int np = c.length / 2;
          double[] lats = new double[np + 1];
          double[] lons = new double[np + 1];
          for (int i = 0; i < np; i++) {
            lats[i] = Double.parseDouble(c[2 * i]);
            lons[i] = Double.parseDouble(c[2 * i + 1]);
          }
          lats[np] = lats[0];
          lons[np] = lons[0];
          polys[ri] = new org.apache.lucene.geo.Polygon(lats, lons);
        }
        q = Geo3DPoint.newPolygonQuery("p", polys);
      } else {
        q = Geo3DPoint.newDistanceQuery(
            "p", Double.parseDouble(p[1]), Double.parseDouble(p[2]),
            Double.parseDouble(p[3]));
      }
      TopDocs td = s.search(q, Math.max(1, nDocs));
      int[] ids = new int[td.scoreDocs.length];
      for (int i = 0; i < ids.length; i++) ids[i] = td.scoreDocs[i].doc;
      java.util.Arrays.sort(ids);
      StringBuilder out = new StringBuilder();
      for (int id : ids) {
        if (out.length() > 0) out.append(",");
        out.append(id);
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


STRDIST_JAVA = r"""
import org.apache.lucene.search.spell.*;

/** StringDistance family ground truth: stdin lines '<s1>|<s2>', output
 *  per line Float.toString of JaroWinkler : NGram(2) : NGram(3) :
 *  Levenstein : LuceneLevenshtein. */
public class GroundTruthStrDist {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    JaroWinklerDistance jw = new JaroWinklerDistance();
    NGramDistance n2 = new NGramDistance(2);
    NGramDistance n3 = new NGramDistance(3);
    LevensteinDistance lev = new LevensteinDistance();
    LuceneLevenshteinDistance luc = new LuceneLevenshteinDistance();
    String line;
    while ((line = in.readLine()) != null) {
      if (line.isEmpty()) continue;
      String[] p = line.split("\\|", -1);
      System.out.println(
          Float.toString(jw.getDistance(p[0], p[1])) + ":"
          + Float.toString(n2.getDistance(p[0], p[1])) + ":"
          + Float.toString(n3.getDistance(p[0], p[1])) + ":"
          + Float.toString(lev.getDistance(p[0], p[1])) + ":"
          + Float.toString(luc.getDistance(p[0], p[1])));
    }
  }
}
"""


IDXSPLIT_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;

/** lucene/misc index splitters ground truth. Corpus line:
 *  '<pk> <body tokens...>' (pk = StringField + NumericDocValues orig).
 *  Queries:
 *  PK <midTerm> <term>     -> PKIndexSplitter(midTerm): per half,
 *                             orig ids in docid order + top-10 of a
 *                             body TermQuery as orig:score
 *  MP <numParts> <seq01> <term> -> MultiPassIndexSplitter
 *  Output parts joined by '#': '<origs_csv>|<orig:score;...>' */
public class GroundTruthIdxSplit {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      String[] p = in.readLine().split(" ", 2);
      Document d = new Document();
      d.add(new StringField("pk", p[0], Field.Store.NO));
      d.add(new NumericDocValuesField("orig", i));
      d.add(new Field("body", p[1], ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      Directory[] parts;
      if (p[0].equals("PK")) {
        parts = new Directory[] { new RAMDirectory(), new RAMDirectory() };
        org.apache.lucene.index.PKIndexSplitter sp =
            new org.apache.lucene.index.PKIndexSplitter(
                dir, parts[0], parts[1], new Term("pk", p[1]));
        sp.split();
      } else {
        int n = Integer.parseInt(p[1]);
        parts = new Directory[n];
        for (int i = 0; i < n; i++) parts[i] = new RAMDirectory();
        org.apache.lucene.index.MultiPassIndexSplitter sp =
            new org.apache.lucene.index.MultiPassIndexSplitter();
        IndexReader r0 = DirectoryReader.open(dir);
        sp.split(r0, parts, p[2].equals("1"));
        r0.close();
      }
      String term = p[p.length - 1];
      StringBuilder out = new StringBuilder();
      for (Directory part : parts) {
        if (out.length() > 0) out.append("#");
        IndexReader r = DirectoryReader.open(part);
        IndexSearcher s = new IndexSearcher(r);
        NumericDocValues orig = MultiDocValues.getNumericValues(r, "orig");
        StringBuilder ids = new StringBuilder();
        for (int d2 = 0; d2 < r.maxDoc(); d2++) {
          if (ids.length() > 0) ids.append(",");
          ids.append(orig.get(d2));
        }
        TopDocs td = s.search(new TermQuery(new Term("body", term)), 10);
        StringBuilder hits = new StringBuilder();
        for (ScoreDoc sd : td.scoreDocs) {
          if (hits.length() > 0) hits.append(";");
          hits.append(orig.get(sd.doc)).append(":")
              .append(Float.toString(sd.score));
        }
        out.append(ids.length() == 0 ? "-" : ids.toString())
           .append("|").append(hits.length() == 0 ? "-" : hits.toString());
        r.close();
      }
      System.out.println(out.toString());
    }
  }
}
"""


COMPLETION_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.search.suggest.document.*;

/** suggest/document completion family ground truth. Corpus line:
 *  '<surface> <weight> <ctxCSV|_>' — every doc gets
 *  SuggestField("sugg", surface, weight); docs with contexts also get
 *  ContextSuggestField("csugg", surface, weight, ctxs). Queries:
 *  CPREFIX num prefix
 *  CREGEX num regex
 *  CFUZZY num maxEdits prefLen minFuzzy transp(0|1) term
 *  CCTX num prefix all|ctx:boost:exact01,...
 *  Output: 'doc:surface:ctx:score;...' (ctx '_' when null). */
public class GroundTruthCompletion {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setCodec(new org.apache.lucene.codecs.lucene62.Lucene62Codec() {
      @Override
      public org.apache.lucene.codecs.PostingsFormat
          getPostingsFormatForField(String field) {
        if (field.equals("sugg") || field.equals("csugg")) {
          return org.apache.lucene.codecs.PostingsFormat.forName("completion");
        }
        return super.getPostingsFormatForField(field);
      }
    });
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    for (int i = 0; i < nDocs; i++) {
      String[] p = in.readLine().trim().split(" ");
      Document d = new Document();
      int weight = Integer.parseInt(p[1]);
      String surface = p[0].replace('_', ' ');  // _ = multi-token space
      d.add(new SuggestField("sugg", surface, weight));
      if (!p[2].equals("_")) {
        d.add(new ContextSuggestField("csugg", surface, weight,
                                      p[2].split(",")));
      }
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    SuggestIndexSearcher s =
        new SuggestIndexSearcher(DirectoryReader.open(dir));

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      int num = Integer.parseInt(p[1]);
      CompletionQuery q;
      if (p[0].equals("CPREFIX")) {
        // remaining args re-join: multi-token prefixes analyze through
        // the CompletionAnalyzer's preserveSep machinery (SEP_LABEL)
        q = new PrefixCompletionQuery(
            new GroundTruth.WS(),
            new Term("sugg", String.join(
                " ", java.util.Arrays.copyOfRange(p, 2, p.length))));
      } else if (p[0].equals("CREGEX")) {
        q = new RegexCompletionQuery(new Term("sugg", p[2]));
      } else if (p[0].equals("CFUZZY")) {
        q = new FuzzyCompletionQuery(
            new GroundTruth.WS(), new Term("sugg", p[6]), null,
            Integer.parseInt(p[2]), p[5].equals("1"),
            Integer.parseInt(p[3]), Integer.parseInt(p[4]), false,
            org.apache.lucene.util.automaton.Operations
                .DEFAULT_MAX_DETERMINIZED_STATES);
      } else if (p[0].equals("CCTX")) {
        ContextQuery cq = new ContextQuery(new PrefixCompletionQuery(
            new GroundTruth.WS(), new Term("csugg", p[2])));
        if (p[3].equals("all")) {
          cq.addAllContexts();
        } else {
          for (String spec : p[3].split(",")) {
            String[] cb = spec.split(":");
            cq.addContext(cb[0], Float.parseFloat(cb[1]),
                          cb[2].equals("1"));
          }
        }
        q = cq;
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      TopSuggestDocs td = s.suggest(q, num);
      StringBuilder out = new StringBuilder();
      for (TopSuggestDocs.SuggestScoreDoc sd : td.scoreLookupDocs()) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(sd.key).append(":")
           .append(sd.context == null ? "_" : sd.context).append(":")
           .append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
  }
}
"""


GEOPOINT_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.spatial.geopoint.document.GeoPointField;
import org.apache.lucene.spatial.geopoint.search.GeoPointInBBoxQuery;

/** GeoPointField (lucene/spatial geopoint — morton/z-order prefix
 *  terms) ground truth: docs are 'lat lon' doubles; queries:
 *  ENC lat lon              -> Long.toString(encodeLatLon)
 *  DEC hash                 -> decodeLatitude + ' ' + decodeLongitude
 *  BBOX minLat maxLat minLon maxLon -> matching docids ASC */
public class GroundTruthGeoPoint {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    for (int i = 0; i < nDocs; i++) {
      String[] p = in.readLine().trim().split(" ");
      Document d = new Document();
      d.add(new GeoPointField("p", Double.parseDouble(p[0]),
                              Double.parseDouble(p[1]), Field.Store.NO));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      StringBuilder out = new StringBuilder();
      if (p[0].equals("ENC")) {
        out.append(Long.toString(GeoPointField.encodeLatLon(
            Double.parseDouble(p[1]), Double.parseDouble(p[2]))));
      } else if (p[0].equals("DEC")) {
        long h = Long.parseLong(p[1]);
        out.append(Double.toString(GeoPointField.decodeLatitude(h)))
           .append(" ")
           .append(Double.toString(GeoPointField.decodeLongitude(h)));
      } else if (p[0].equals("BBOX")) {
        Query q = new GeoPointInBBoxQuery("p",
            Double.parseDouble(p[1]), Double.parseDouble(p[2]),
            Double.parseDouble(p[3]), Double.parseDouble(p[4]));
        TopDocs td = s.search(q, Math.max(1, nDocs));
        int[] ids = new int[td.scoreDocs.length];
        for (int i = 0; i < ids.length; i++) ids[i] = td.scoreDocs[i].doc;
        java.util.Arrays.sort(ids);
        for (int id : ids) {
          if (out.length() > 0) out.append(",");
          out.append(id);
        }
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


SLOWFUZZY_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;

/** SlowFuzzyQuery ground truth: WS body docs; query
 *  'SF <minSimOrEdits> <prefixLen> <maxExpansions> <term>' runs the
 *  sandbox SlowFuzzyQuery (TopTermsScoringBooleanQueryRewrite). Output:
 *  '<t:boost,...>|<doc:score;...>' — the REWRITTEN query's clauses
 *  (term order, Float.toString boosts) and the top-10. */
public class GroundTruthSlowFuzzy {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      float minSim = Float.parseFloat(p[1]);
      int prefixLen = Integer.parseInt(p[2]);
      int maxExp = Integer.parseInt(p[3]);
      org.apache.lucene.sandbox.queries.SlowFuzzyQuery q =
          new org.apache.lucene.sandbox.queries.SlowFuzzyQuery(
              new Term("body", p[4]), minSim, prefixLen, maxExp);
      Query rw = s.rewrite(q);
      StringBuilder cl = new StringBuilder();
      if (rw instanceof BooleanQuery) {
        for (BooleanClause c : (BooleanQuery) rw) {
          if (cl.length() > 0) cl.append(",");
          appendClause(cl, c.getQuery());
        }
      } else if (!(rw instanceof MatchNoDocsQuery)) {
        appendClause(cl, rw);
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(
          (cl.length() == 0 ? "-" : cl.toString()) + "|"
          + (out.length() == 0 ? "-" : out.toString()));
    }
    r.close();
  }

  /** unwrap BoostQuery / the zero-boost ConstantScoreQuery rewrite
   *  (BoostQuery.rewrite wraps boost==0f clauses in a CSQ) */
  static void appendClause(StringBuilder cl, Query cq) {
    float boost = 1f;
    if (cq instanceof BoostQuery) {
      boost = ((BoostQuery) cq).getBoost();
      cq = ((BoostQuery) cq).getQuery();
    }
    if (cq instanceof ConstantScoreQuery) {
      cq = ((ConstantScoreQuery) cq).getQuery();
    }
    cl.append(((TermQuery) cq).getTerm().text())
      .append(":").append(Float.toString(boost));
  }
}
"""


FLT_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;

/** FuzzyLikeThisQuery ground truth (GT round 29c): WS body docs; query
 *  'maxNumTerms;ignoreTF;minSim;prefixLen;text...' runs the sandbox
 *  FuzzyLikeThisQuery with one addTerms call. Output:
 *  '<rewritten groups>|<doc:score;...>' where groups print as
 *  t^b or [t1^b1,t2^b2] joined by '/', Float.toString boosts. */
public class GroundTruthFLT {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().split(";", 5);
      org.apache.lucene.sandbox.queries.FuzzyLikeThisQuery q =
          new org.apache.lucene.sandbox.queries.FuzzyLikeThisQuery(
              Integer.parseInt(p[0]), new GroundTruth.WS());
      q.setIgnoreTF(Boolean.parseBoolean(p[1]));
      // '|'-separated segments = one addTerms call each; a segment
      // 'ms~pl~text' overrides the default (minSim, prefixLen)
      for (String seg : p[4].split("\\|")) {
        float ms = Float.parseFloat(p[2]);
        int pl = Integer.parseInt(p[3]);
        if (seg.contains("~")) {
          String[] sp = seg.split("~", 3);
          ms = Float.parseFloat(sp[0]);
          pl = Integer.parseInt(sp[1]);
          seg = sp[2];
        }
        q.addTerms(seg, "body", ms, pl);
      }
      // ONE rewrite step: the raw group structure, before the
      // 1-clause-BooleanQuery collapse (scoring-equivalent:
      // (float) of a double holding one float is that float)
      Query rw = q.rewrite(r);
      StringBuilder cl = new StringBuilder();
      if (rw instanceof BooleanQuery) {
        for (BooleanClause c : (BooleanQuery) rw) {
          if (cl.length() > 0) cl.append("/");
          Query cq = c.getQuery();
          if (cq instanceof BooleanQuery) {
            cl.append("[");
            boolean first = true;
            for (BooleanClause ic : (BooleanQuery) cq) {
              if (!first) cl.append(",");
              first = false;
              appendFlt(cl, ic.getQuery());
            }
            cl.append("]");
          } else {
            appendFlt(cl, cq);
          }
        }
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(
          (cl.length() == 0 ? "-" : cl.toString()) + "|"
          + (out.length() == 0 ? "-" : out.toString()));
    }
    r.close();
  }

  static void appendFlt(StringBuilder cl, Query cq) {
    float boost = 1f;
    if (cq instanceof BoostQuery) {
      boost = ((BoostQuery) cq).getBoost();
      cq = ((BoostQuery) cq).getQuery();
    }
    if (cq instanceof ConstantScoreQuery) {
      cq = ((ConstantScoreQuery) cq).getQuery();
    }
    cl.append(((TermQuery) cq).getTerm().text())
      .append("^").append(Float.toString(boost));
  }
}
"""


FIELDMASK_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.search.spans.*;
import org.apache.lucene.store.*;

/** FieldMaskingSpanQuery ground truth: two WS TextFields per doc
 *  ('body' and 'alt', corpus line "<body tokens>|<alt tokens>");
 *  clauses given as b:term / a:term, a: wrapped in
 *  FieldMaskingSpanQuery(..., "body") so it can join a SpanNear/
 *  SpanFirst on body. Scoring: inner-field TERM stats, masked-to
 *  field's norms + collection stats (SpanWeight.buildSimWeight). */
public class GroundTruthFieldMask {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_NOT_STORED);
    for (int i = 0; i < nDocs; i++) {
      String[] parts = in.readLine().split("\\|", 2);
      Document d = new Document();
      d.add(new Field("body", parts[0], ft));
      d.add(new Field("alt", parts[1], ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      String[] p = in.readLine().trim().split(" ");
      Query q;
      if (p[0].equals("MNEAR")) {
        // MNEAR slop o|u clause clause ...
        int slop = Integer.parseInt(p[1]);
        boolean inOrder = p[2].equals("o");
        SpanQuery[] cl = new SpanQuery[p.length - 3];
        for (int i = 3; i < p.length; i++) cl[i - 3] = clause(p[i]);
        q = new SpanNearQuery(cl, slop, inOrder);
      } else if (p[0].equals("MFIRST")) {
        // MFIRST end clause
        q = new SpanFirstQuery(clause(p[2]), Integer.parseInt(p[1]));
      } else {
        throw new IllegalArgumentException(p[0]);
      }
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }

  static SpanQuery clause(String spec) {
    String field = spec.startsWith("a:") ? "alt" : "body";
    SpanTermQuery t = new SpanTermQuery(
        new Term(field, spec.substring(2)));
    return field.equals("alt") ? new FieldMaskingSpanQuery(t, "body") : t;
  }
}
"""


MLT_JAVA = r"""
import org.apache.lucene.document.*;
import org.apache.lucene.index.*;
import org.apache.lucene.search.*;
import org.apache.lucene.store.*;
import org.apache.lucene.queries.mlt.MoreLikeThis;

public class GroundTruthMLT {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    Directory dir = new RAMDirectory();
    IndexWriterConfig cfg = new IndexWriterConfig(new GroundTruth.WS());
    cfg.setMaxBufferedDocs(Math.max(2, nDocs + 1));
    IndexWriter w = new IndexWriter(dir, cfg);
    FieldType ft = new FieldType(TextField.TYPE_STORED);  // MLT re-analyzes
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", in.readLine(), ft));
      w.addDocument(d);
    }
    w.forceMerge(1);
    w.close();
    IndexReader r = DirectoryReader.open(dir);
    IndexSearcher s = new IndexSearcher(r);

    int nQ = Integer.parseInt(in.readLine().trim());
    for (int qi = 0; qi < nQ; qi++) {
      // MLT <docid> <maxQueryTerms> <minTermFreq> <minDocFreq>
      String[] p = in.readLine().trim().split(" ");
      MoreLikeThis mlt = new MoreLikeThis(r);
      mlt.setAnalyzer(new GroundTruth.WS());
      mlt.setFieldNames(new String[]{"body"});
      mlt.setMaxQueryTerms(Integer.parseInt(p[2]));
      mlt.setMinTermFreq(Integer.parseInt(p[3]));
      mlt.setMinDocFreq(Integer.parseInt(p[4]));
      Query q = mlt.like(Integer.parseInt(p[1]));
      TopDocs td = s.search(q, 10);
      StringBuilder out = new StringBuilder();
      for (ScoreDoc sd : td.scoreDocs) {
        if (out.length() > 0) out.append(";");
        out.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(out.length() == 0 ? "-" : out.toString());
    }
    r.close();
  }
}
"""


FOLD_JAVA = r"""
import org.apache.lucene.analysis.miscellaneous.ASCIIFoldingFilter;

public class GroundTruthFold {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    // one hex-encoded UTF-16BE token per line -> folded hex (UTF-16BE)
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      line = line.trim();
      if (line.isEmpty()) { System.out.println(); continue; }
      byte[] b = new byte[line.length() / 2];
      for (int i = 0; i < b.length; i++)
        b[i] = (byte) Integer.parseInt(line.substring(2 * i, 2 * i + 2), 16);
      String tok = new String(b, "UTF-16BE");
      char[] inBuf = tok.toCharArray();
      char[] outBuf = new char[inBuf.length * 4];
      int n = ASCIIFoldingFilter.foldToASCII(inBuf, 0, outBuf, 0, inBuf.length);
      byte[] ob = new String(outBuf, 0, n).getBytes("UTF-16BE");
      sb.setLength(0);
      for (byte x : ob) sb.append(String.format("%02x", x));
      System.out.println(sb.toString());
    }
  }
}
"""


WDF_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.miscellaneous.WordDelimiterFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.util.CharArraySet;

public class GroundTruthWDF {
  public static void main(String[] args) throws Exception {
    int flags = Integer.parseInt(args[0]);
    CharArraySet prot = null;
    if (args.length > 1 && !args[1].equals("-")) {
      prot = new CharArraySet(java.util.Arrays.asList(args[1].split(",")), false);
    }
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts = new WordDelimiterFilter(tok, flags, prot);
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] b = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : b) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


SYN_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.synonym.SynonymFilter;
import org.apache.lucene.analysis.synonym.SynonymMap;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionLengthAttribute;
import org.apache.lucene.analysis.tokenattributes.TypeAttribute;
import org.apache.lucene.util.CharsRef;

public class GroundTruthSyn {
  static CharsRef phrase(String spaceSep) {
    return new CharsRef(spaceSep.replace(' ', (char) 0));
  }
  public static void main(String[] args) throws Exception {
    boolean ignoreCase = args[0].equals("1");
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nRules = Integer.parseInt(in.readLine().trim());
    SynonymMap map;
    if (args.length > 1 && args[1].startsWith("wordnet:")) {
      boolean expand = args[1].equals("wordnet:1");
      StringBuilder rules = new StringBuilder();
      for (int i = 0; i < nRules; i++) rules.append(in.readLine()).append("\n");
      org.apache.lucene.analysis.synonym.WordnetSynonymParser p =
          new org.apache.lucene.analysis.synonym.WordnetSynonymParser(
              true, expand, new GroundTruth.WS());
      p.parse(new StringReader(rules.toString()));
      map = p.build();
    } else if (args.length > 1 && args[1].startsWith("solr:")) {
      // raw Solr rules format through the REAL SolrSynonymParser
      boolean expand = args[1].equals("solr:1");
      StringBuilder rules = new StringBuilder();
      for (int i = 0; i < nRules; i++) rules.append(in.readLine()).append("\n");
      org.apache.lucene.analysis.synonym.SolrSynonymParser p =
          new org.apache.lucene.analysis.synonym.SolrSynonymParser(
              true, expand, new GroundTruth.WS());
      p.parse(new StringReader(rules.toString()));
      map = p.build();
    } else {
      SynonymMap.Builder b = new SynonymMap.Builder(true);
      for (int i = 0; i < nRules; i++) {
        String[] p = in.readLine().split("\\|");
        b.add(phrase(p[0]), phrase(p[1]), p[2].equals("1"));
      }
      map = b.build();
    }
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts = new SynonymFilter(tok, map, ignoreCase);
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      PositionLengthAttribute pl = ts.addAttribute(PositionLengthAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      TypeAttribute type = ts.addAttribute(TypeAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(pl.getPositionLength()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":")
          .append(type.type()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


SHINGLE_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.StopFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.shingle.ShingleFilter;
import org.apache.lucene.analysis.standard.StandardAnalyzer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionLengthAttribute;
import org.apache.lucene.analysis.tokenattributes.TypeAttribute;

public class GroundTruthShingle {
  public static void main(String[] args) throws Exception {
    int min = Integer.parseInt(args[0]);
    int max = Integer.parseInt(args[1]);
    boolean unigrams = args[2].equals("1");
    boolean uniNoSh = args[3].equals("1");
    boolean useStop = args[4].equals("1");
    String sep = args.length > 5 ? args[5] : " ";
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts = tok;
      if (useStop) ts = new StopFilter(ts, StandardAnalyzer.STOP_WORDS_SET);
      ShingleFilter sh = new ShingleFilter(ts, min, max);
      sh.setOutputUnigrams(unigrams);
      sh.setOutputUnigramsIfNoShingles(uniNoSh);
      sh.setTokenSeparator(sep);
      ts = sh;
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      PositionLengthAttribute pl = ts.addAttribute(PositionLengthAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      TypeAttribute type = ts.addAttribute(TypeAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(pl.getPositionLength()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":")
          .append(type.type()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


COMMONGRAMS_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.commongrams.CommonGramsFilter;
import org.apache.lucene.analysis.commongrams.CommonGramsQueryFilter;
import org.apache.lucene.analysis.core.StopFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.standard.StandardAnalyzer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionLengthAttribute;
import org.apache.lucene.analysis.tokenattributes.TypeAttribute;
import org.apache.lucene.analysis.util.CharArraySet;

public class GroundTruthCommonGrams {
  public static void main(String[] args) throws Exception {
    boolean query = args[0].equals("query");
    boolean useStop = args[1].equals("1");
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nWords = Integer.parseInt(in.readLine().trim());
    java.util.List<String> words = new java.util.ArrayList<>();
    for (int i = 0; i < nWords; i++) words.add(in.readLine());
    CharArraySet common = new CharArraySet(words, false);
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts = tok;
      if (useStop) ts = new StopFilter(ts, StandardAnalyzer.STOP_WORDS_SET);
      CommonGramsFilter cgf = new CommonGramsFilter(ts, common);
      ts = query ? new CommonGramsQueryFilter(cgf) : cgf;
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      PositionLengthAttribute pl = ts.addAttribute(PositionLengthAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      TypeAttribute type = ts.addAttribute(TypeAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(pl.getPositionLength()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":")
          .append(type.type()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


REVWILD_JAVA = r"""
import java.io.StringReader;
import java.util.HashMap;
import java.util.Map;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.reverse.ReverseStringFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.solr.analysis.ReversedWildcardFilterFactory;

public class GroundTruthRevWild {
  public static void main(String[] args) throws Exception {
    String mode = args[0];  // stream | should | reverse
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    if (mode.equals("should")) {
      Map<String,String> fargs = new HashMap<>();
      fargs.put("luceneMatchVersion", "7.0.0");
      fargs.put("withOriginal", args[1]);
      fargs.put("maxPosAsterisk", args[2]);
      fargs.put("maxPosQuestion", args[3]);
      fargs.put("minTrailing", args[4]);
      fargs.put("maxFractionAsterisk", args[5]);
      ReversedWildcardFilterFactory fac = new ReversedWildcardFilterFactory(fargs);
      while ((line = in.readLine()) != null)
        System.out.println(fac.shouldReverse(line) ? "1" : "0");
      return;
    }
    boolean withOrig = args.length > 1 && args[1].equals("1");
    boolean withMarker = args.length > 2 && args[2].equals("1");
    Map<String,String> fargs = new HashMap<>();
    fargs.put("luceneMatchVersion", "7.0.0");
    fargs.put("withOriginal", withOrig ? "true" : "false");
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts;
      if (mode.equals("reverse")) {
        ts = withMarker
            ? new ReverseStringFilter(tok, ReverseStringFilter.START_OF_HEADING_MARKER)
            : new ReverseStringFilter(tok);
      } else {
        ts = new ReversedWildcardFilterFactory(new HashMap<>(fargs)).create(tok);
      }
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


CJK_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.cjk.CJKBigramFilter;
import org.apache.lucene.analysis.cjk.CJKWidthFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.standard.StandardTokenizer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionLengthAttribute;
import org.apache.lucene.analysis.tokenattributes.TypeAttribute;

public class GroundTruthCJK {
  public static void main(String[] args) throws Exception {
    String mode = args[0];  // width | bigram | types
    int flags = args.length > 1 ? Integer.parseInt(args[1])
        : (CJKBigramFilter.HAN | CJKBigramFilter.HIRAGANA
           | CJKBigramFilter.KATAKANA | CJKBigramFilter.HANGUL);
    boolean outputUnigrams = args.length > 2 && args[2].equals("1");
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      TokenStream ts;
      if (mode.equals("width")) {
        WhitespaceTokenizer tok = new WhitespaceTokenizer();
        tok.setReader(new StringReader(line));
        ts = new CJKWidthFilter(tok);
      } else {
        StandardTokenizer tok = new StandardTokenizer();
        tok.setReader(new StringReader(line));
        ts = mode.equals("types") ? tok
            : new CJKBigramFilter(tok, flags, outputUnigrams);
      }
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      PositionLengthAttribute pl = ts.addAttribute(PositionLengthAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      TypeAttribute type = ts.addAttribute(TypeAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(pl.getPositionLength()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":")
          .append(type.type()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


CHARFILTER_JAVA = r"""
import java.io.StringReader;
import java.util.regex.Pattern;
import org.apache.lucene.analysis.CharFilter;
import org.apache.lucene.analysis.charfilter.MappingCharFilter;
import org.apache.lucene.analysis.charfilter.NormalizeCharMap;
import org.apache.lucene.analysis.pattern.PatternReplaceCharFilter;

public class GroundTruthCharFilter {
  public static void main(String[] args) throws Exception {
    String mode = args[0];  // mapping | patrep
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    NormalizeCharMap map = null;
    Pattern pat = null;
    String repl = null;
    if (mode.equals("mapping")) {
      int n = Integer.parseInt(in.readLine().trim());
      NormalizeCharMap.Builder b = new NormalizeCharMap.Builder();
      for (int i = 0; i < n; i++) {
        String[] parts = in.readLine().split("\t", -1);
        b.add(unhex(parts[0]), unhex(parts[1]));
      }
      map = b.build();
    } else {
      pat = Pattern.compile(unhex(in.readLine().trim()));
      repl = unhex(in.readLine().trim());
    }
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      CharFilter cf = mode.equals("mapping")
          ? new MappingCharFilter(map, new StringReader(text))
          : new PatternReplaceCharFilter(pat, repl, new StringReader(text));
      StringBuilder outText = new StringBuilder();
      int c;
      while ((c = cf.read()) != -1) outText.append((char) c);
      sb.setLength(0);
      byte[] bb = outText.toString().getBytes("UTF-16BE");
      for (byte x : bb) sb.append(String.format("%02x", x));
      sb.append("|");
      for (int i = 0; i <= outText.length(); i++) {
        if (i > 0) sb.append(",");
        sb.append(cf.correctOffset(i));
      }
      cf.close();
      System.out.println(sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


KWMISC_JAVA = r"""
import java.io.StringReader;
import java.util.Arrays;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.en.PorterStemFilter;
import org.apache.lucene.analysis.miscellaneous.KeywordRepeatFilter;
import org.apache.lucene.analysis.miscellaneous.RemoveDuplicatesTokenFilter;
import org.apache.lucene.analysis.miscellaneous.SetKeywordMarkerFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.util.CharArraySet;

public class GroundTruthKwMisc {
  public static void main(String[] args) throws Exception {
    String mode = args[0];  // repeat | marker
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nProt = Integer.parseInt(in.readLine().trim());
    java.util.List<String> prot = new java.util.ArrayList<>();
    for (int i = 0; i < nProt; i++) prot.add(in.readLine());
    CharArraySet protSet = new CharArraySet(prot, false);
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts = new LowerCaseFilter(tok);
      if (mode.equals("repeat")) {
        ts = new KeywordRepeatFilter(ts);
        if (!prot.isEmpty()) ts = new SetKeywordMarkerFilter(ts, protSet);
        ts = new PorterStemFilter(ts);
        ts = new RemoveDuplicatesTokenFilter(ts);
      } else {
        ts = new SetKeywordMarkerFilter(ts, protSet);
        ts = new PorterStemFilter(ts);
      }
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


NGRAM_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.ngram.EdgeNGramTokenFilter;
import org.apache.lucene.analysis.ngram.NGramTokenFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionLengthAttribute;

public class GroundTruthNGram {
  public static void main(String[] args) throws Exception {
    String mode = args[0];  // ngram | edge
    int min = Integer.parseInt(args[1]);
    int max = Integer.parseInt(args[2]);
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts = mode.equals("edge")
          ? new EdgeNGramTokenFilter(tok, min, max)
          : new NGramTokenFilter(tok, min, max);
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      PositionLengthAttribute pl = ts.addAttribute(PositionLengthAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(pl.getPositionLength()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


PATTERN_JAVA = r"""
import java.io.StringReader;
import java.util.regex.Pattern;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.pattern.PatternCaptureGroupTokenFilter;
import org.apache.lucene.analysis.pattern.PatternTokenizer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;

public class GroundTruthPattern {
  public static void main(String[] args) throws Exception {
    String mode = args[0];  // tok | capture
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int group = 0;
    boolean preserve = false;
    Pattern tokPat = null;
    Pattern[] pats = null;
    if (mode.equals("tok")) {
      group = Integer.parseInt(args[1]);
      tokPat = Pattern.compile(unhex(in.readLine().trim()));
    } else {
      preserve = args[1].equals("1");
      int n = Integer.parseInt(in.readLine().trim());
      pats = new Pattern[n];
      for (int i = 0; i < n; i++) pats[i] = Pattern.compile(unhex(in.readLine().trim()));
    }
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      TokenStream ts;
      if (mode.equals("tok")) {
        PatternTokenizer tok = new PatternTokenizer(tokPat, group);
        tok.setReader(new StringReader(text));
        ts = tok;
      } else {
        WhitespaceTokenizer tok = new WhitespaceTokenizer();
        tok.setReader(new StringReader(text));
        ts = new PatternCaptureGroupTokenFilter(tok, preserve, pats);
      }
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


PATH_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.path.PathHierarchyTokenizer;
import org.apache.lucene.analysis.path.ReversePathHierarchyTokenizer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;

public class GroundTruthPath {
  public static void main(String[] args) throws Exception {
    boolean reverse = args[0].equals("reverse");
    char delim = args[1].charAt(0);
    char repl = args[2].charAt(0);
    int skip = Integer.parseInt(args[3]);
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      Tokenizer ts = reverse
          ? new ReversePathHierarchyTokenizer(1024, delim, repl, skip)
          : new PathHierarchyTokenizer(1024, delim, repl, skip);
      ts.setReader(new StringReader(text));
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


MISC_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.DecimalDigitFilter;
import org.apache.lucene.analysis.core.KeywordTokenizer;
import org.apache.lucene.analysis.core.UpperCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.miscellaneous.CapitalizationFilter;
import org.apache.lucene.analysis.miscellaneous.CodepointCountFilter;
import org.apache.lucene.analysis.miscellaneous.FingerprintFilter;
import org.apache.lucene.analysis.miscellaneous.HyphenatedWordsFilter;
import org.apache.lucene.analysis.miscellaneous.KeepWordFilter;
import org.apache.lucene.analysis.miscellaneous.LengthFilter;
import org.apache.lucene.analysis.miscellaneous.LimitTokenCountFilter;
import org.apache.lucene.analysis.miscellaneous.LimitTokenOffsetFilter;
import org.apache.lucene.analysis.miscellaneous.LimitTokenPositionFilter;
import org.apache.lucene.analysis.miscellaneous.ScandinavianFoldingFilter;
import org.apache.lucene.analysis.miscellaneous.ScandinavianNormalizationFilter;
import org.apache.lucene.analysis.miscellaneous.SetKeywordMarkerFilter;
import org.apache.lucene.analysis.miscellaneous.TrimFilter;
import org.apache.lucene.analysis.miscellaneous.TruncateTokenFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.tr.ApostropheFilter;
import org.apache.lucene.analysis.util.CharArraySet;

public class GroundTruthMisc {
  public static void main(String[] args) throws Exception {
    String mode = args[0];
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    java.util.List<String> words = new java.util.ArrayList<>();
    java.util.List<char[]> prefixes = new java.util.ArrayList<>();
    if (mode.equals("truncate") || mode.equals("keep") || mode.equals("cap")) {
      int n = Integer.parseInt(in.readLine().trim());
      for (int i = 0; i < n; i++) words.add(unhex(in.readLine()));
      if (mode.equals("cap")) {
        int m = Integer.parseInt(in.readLine().trim());
        for (int i = 0; i < m; i++) prefixes.add(unhex(in.readLine()).toCharArray());
      }
    }
    CharArraySet wset = new CharArraySet(words, false);
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      Tokenizer tok = (mode.equals("trim") || mode.equals("cap"))
          ? new KeywordTokenizer() : new WhitespaceTokenizer();
      tok.setReader(new StringReader(text));
      TokenStream ts;
      switch (mode) {
        case "trim": ts = new TrimFilter(tok); break;
        case "length":
          ts = new LengthFilter(tok, Integer.parseInt(args[1]), Integer.parseInt(args[2]));
          break;
        case "truncate":
          ts = new TruncateTokenFilter(
              new SetKeywordMarkerFilter(tok, wset), Integer.parseInt(args[1]));
          break;
        case "cap":
          ts = new CapitalizationFilter(tok, args[1].equals("1"),
              words.isEmpty() ? null : wset, args[2].equals("1"),
              prefixes.isEmpty() ? null : prefixes, Integer.parseInt(args[3]),
              Integer.parseInt(args[4]), Integer.parseInt(args[5]));
          break;
        case "keep": ts = new KeepWordFilter(tok, wset); break;
        case "hyphen": ts = new HyphenatedWordsFilter(tok); break;
        case "fingerprint":
          ts = new FingerprintFilter(tok, Integer.parseInt(args[1]),
              unhex(args[2]).charAt(0));
          break;
        case "cpcount":
          ts = new CodepointCountFilter(tok, Integer.parseInt(args[1]),
              Integer.parseInt(args[2]));
          break;
        case "decimal": ts = new DecimalDigitFilter(tok); break;
        case "scannorm": ts = new ScandinavianNormalizationFilter(tok); break;
        case "scanfold": ts = new ScandinavianFoldingFilter(tok); break;
        case "limitcount":
          ts = new LimitTokenCountFilter(tok, Integer.parseInt(args[1]),
              args[2].equals("1"));
          break;
        case "limitpos":
          ts = new LimitTokenPositionFilter(tok, Integer.parseInt(args[1]),
              args[2].equals("1"));
          break;
        case "limitoffset":
          ts = new LimitTokenOffsetFilter(tok, Integer.parseInt(args[1]),
              args[2].equals("1"));
          break;
        case "upper": ts = new UpperCaseFilter(tok); break;
        case "apostrophe": ts = new ApostropheFilter(tok); break;
        default: throw new IllegalArgumentException(mode);
      }
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


SNOWBALL_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.snowball.SnowballFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;

public class GroundTruthSnowball {
  public static void main(String[] args) throws Exception {
    String lang = args.length > 0 ? args[0] : "English";
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      TokenStream ts;
      if (lang.equals("FrenchAnalyzer")) {
        // the full per-language chain: StandardTokenizer + Standard +
        // Elision + LowerCase + Stop(french) + FrenchLightStem
        org.apache.lucene.analysis.fr.FrenchAnalyzer an =
            new org.apache.lucene.analysis.fr.FrenchAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("GermanAnalyzer")) {
        org.apache.lucene.analysis.de.GermanAnalyzer an =
            new org.apache.lucene.analysis.de.GermanAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("ItalianAnalyzer")) {
        org.apache.lucene.analysis.it.ItalianAnalyzer an =
            new org.apache.lucene.analysis.it.ItalianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("SpanishAnalyzer")) {
        org.apache.lucene.analysis.es.SpanishAnalyzer an =
            new org.apache.lucene.analysis.es.SpanishAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("RussianAnalyzer")) {
        org.apache.lucene.analysis.ru.RussianAnalyzer an =
            new org.apache.lucene.analysis.ru.RussianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("DutchAnalyzer")) {
        org.apache.lucene.analysis.nl.DutchAnalyzer an =
            new org.apache.lucene.analysis.nl.DutchAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("PortugueseAnalyzer")) {
        org.apache.lucene.analysis.pt.PortugueseAnalyzer an =
            new org.apache.lucene.analysis.pt.PortugueseAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("ArabicAnalyzer")) {
        org.apache.lucene.analysis.ar.ArabicAnalyzer an =
            new org.apache.lucene.analysis.ar.ArabicAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("CzechAnalyzer")) {
        org.apache.lucene.analysis.cz.CzechAnalyzer an =
            new org.apache.lucene.analysis.cz.CzechAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("PersianAnalyzer")) {
        org.apache.lucene.analysis.fa.PersianAnalyzer an =
            new org.apache.lucene.analysis.fa.PersianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("GreekAnalyzer")) {
        org.apache.lucene.analysis.el.GreekAnalyzer an =
            new org.apache.lucene.analysis.el.GreekAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("HindiAnalyzer")) {
        org.apache.lucene.analysis.hi.HindiAnalyzer an =
            new org.apache.lucene.analysis.hi.HindiAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("BulgarianAnalyzer")) {
        org.apache.lucene.analysis.bg.BulgarianAnalyzer an =
            new org.apache.lucene.analysis.bg.BulgarianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("IndonesianAnalyzer")) {
        org.apache.lucene.analysis.id.IndonesianAnalyzer an =
            new org.apache.lucene.analysis.id.IndonesianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("LatvianAnalyzer")) {
        org.apache.lucene.analysis.lv.LatvianAnalyzer an =
            new org.apache.lucene.analysis.lv.LatvianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("SoraniAnalyzer")) {
        org.apache.lucene.analysis.ckb.SoraniAnalyzer an =
            new org.apache.lucene.analysis.ckb.SoraniAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("FinnishAnalyzer")) {
        org.apache.lucene.analysis.fi.FinnishAnalyzer an =
            new org.apache.lucene.analysis.fi.FinnishAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("TurkishAnalyzer")) {
        org.apache.lucene.analysis.tr.TurkishAnalyzer an =
            new org.apache.lucene.analysis.tr.TurkishAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("HungarianAnalyzer")) {
        org.apache.lucene.analysis.hu.HungarianAnalyzer an =
            new org.apache.lucene.analysis.hu.HungarianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("RomanianAnalyzer")) {
        org.apache.lucene.analysis.ro.RomanianAnalyzer an =
            new org.apache.lucene.analysis.ro.RomanianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("CatalanAnalyzer")) {
        org.apache.lucene.analysis.ca.CatalanAnalyzer an =
            new org.apache.lucene.analysis.ca.CatalanAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("BasqueAnalyzer")) {
        org.apache.lucene.analysis.eu.BasqueAnalyzer an =
            new org.apache.lucene.analysis.eu.BasqueAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("IrishAnalyzer")) {
        org.apache.lucene.analysis.ga.IrishAnalyzer an =
            new org.apache.lucene.analysis.ga.IrishAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("ArmenianAnalyzer")) {
        org.apache.lucene.analysis.hy.ArmenianAnalyzer an =
            new org.apache.lucene.analysis.hy.ArmenianAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("PolishAnalyzer")) {
        org.apache.lucene.analysis.pl.PolishAnalyzer an =
            new org.apache.lucene.analysis.pl.PolishAnalyzer();
        ts = an.tokenStream("f", new StringReader(text));
      } else if (lang.equals("StempelStem")) {
        // raw StempelStemmer.stem per whitespace token (null -> token)
        WhitespaceTokenizer tok = new WhitespaceTokenizer();
        tok.setReader(new StringReader(text));
        ts = new org.apache.lucene.analysis.stempel.StempelFilter(
            tok, new org.apache.lucene.analysis.stempel.StempelStemmer(
                org.apache.lucene.analysis.pl.PolishAnalyzer.getDefaultTable()));
      } else {
        WhitespaceTokenizer tok = new WhitespaceTokenizer();
        tok.setReader(new StringReader(text));
        ts = new SnowballFilter(new LowerCaseFilter(tok), lang);
      }
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


HTMLSTRIP_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.CharFilter;
import org.apache.lucene.analysis.charfilter.HTMLStripCharFilter;

public class GroundTruthHtmlStrip {
  public static void main(String[] args) throws Exception {
    java.util.Set<String> escaped = null;
    if (args.length > 0 && !args[0].isEmpty()) {
      escaped = new java.util.HashSet<>();
      for (String t : args[0].split(",")) escaped.add(unhex(t));
    }
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      CharFilter cf = escaped == null
          ? new HTMLStripCharFilter(new StringReader(text))
          : new HTMLStripCharFilter(new StringReader(text), escaped);
      StringBuilder outText = new StringBuilder();
      int c;
      while ((c = cf.read()) != -1) outText.append((char) c);
      sb.setLength(0);
      byte[] bb = outText.toString().getBytes("UTF-16BE");
      for (byte x : bb) sb.append(String.format("%02x", x));
      sb.append("|");
      for (int i = 0; i <= outText.length(); i++) {
        if (i > 0) sb.append(",");
        sb.append(cf.correctOffset(i));
      }
      cf.close();
      System.out.println(sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


CLASSICTOK_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.standard.ClassicFilter;
import org.apache.lucene.analysis.standard.ClassicTokenizer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.tokenattributes.TypeAttribute;

public class GroundTruthClassicTok {
  public static void main(String[] args) throws Exception {
    boolean filter = args.length > 0 && args[0].equals("1");
    int maxLen = args.length > 1 ? Integer.parseInt(args[1]) : 255;
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      ClassicTokenizer tok = new ClassicTokenizer();
      tok.setMaxTokenLength(maxLen);
      tok.setReader(new StringReader(text));
      TokenStream ts = filter ? new ClassicFilter(tok) : tok;
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      TypeAttribute type = ts.addAttribute(TypeAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        byte[] tb = type.type().getBytes("UTF-16BE");
        StringBuilder th = new StringBuilder();
        for (byte x : tb) th.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":")
          .append(th).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


AUTOSTOP_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.query.QueryAutoStopWordAnalyzer;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.document.Document;
import org.apache.lucene.document.Field;
import org.apache.lucene.document.FieldType;
import org.apache.lucene.document.TextField;
import org.apache.lucene.index.DirectoryReader;
import org.apache.lucene.index.IndexWriter;
import org.apache.lucene.index.IndexWriterConfig;
import org.apache.lucene.store.RAMDirectory;

public class GroundTruthAutoStop {
  static final class WSLower extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new WhitespaceTokenizer();
      return new TokenStreamComponents(t, new LowerCaseFilter(t));
    }
  }

  public static void main(String[] args) throws Exception {
    // args: mode(percent|freq) value nDocs; stdin: nDocs doc lines
    // (hex16), then query lines (hex16)
    String mode = args[0];
    float pct = Float.parseFloat(args[1]);
    int nDocs = Integer.parseInt(args[2]);
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    RAMDirectory dir = new RAMDirectory();
    IndexWriter w = new IndexWriter(dir, new IndexWriterConfig(new WSLower()));
    for (int i = 0; i < nDocs; i++) {
      Document d = new Document();
      d.add(new Field("body", unhex(in.readLine()),
            new FieldType(TextField.TYPE_NOT_STORED)));
      w.addDocument(d);
    }
    w.close();
    DirectoryReader r = DirectoryReader.open(dir);
    QueryAutoStopWordAnalyzer a = mode.equals("percent")
        ? new QueryAutoStopWordAnalyzer(new WSLower(), r, pct)
        : new QueryAutoStopWordAnalyzer(new WSLower(), r, (int) pct);
    String[] sw = a.getStopWords("body");
    java.util.Arrays.sort(sw);
    StringBuilder sb = new StringBuilder();
    for (String s : sw) {
      if (sb.length() > 0) sb.append(",");
      sb.append(_hex(s));
    }
    System.out.println(sb.length() == 0 ? "-" : sb.toString());
    String line;
    while ((line = in.readLine()) != null) {
      TokenStream ts = a.tokenStream("body", unhex(line));
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        sb.append(pi.getPositionIncrement()).append(":").append(_hex(term.toString()));
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }

  static String _hex(String s) throws Exception {
    StringBuilder hx = new StringBuilder();
    for (byte x : s.getBytes("UTF-16BE")) hx.append(String.format("%02x", x));
    return hx.toString();
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


QUALITY_JAVA = r"""
import java.io.StringReader;
import java.util.HashMap;
import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.benchmark.quality.Judge;
import org.apache.lucene.benchmark.quality.QualityBenchmark;
import org.apache.lucene.benchmark.quality.QualityQuery;
import org.apache.lucene.benchmark.quality.QualityStats;
import org.apache.lucene.benchmark.quality.trec.TrecJudge;
import org.apache.lucene.benchmark.quality.utils.SimpleQQParser;
import org.apache.lucene.document.Document;
import org.apache.lucene.document.Field;
import org.apache.lucene.document.StringField;
import org.apache.lucene.document.TextField;
import org.apache.lucene.index.DirectoryReader;
import org.apache.lucene.index.IndexWriter;
import org.apache.lucene.index.IndexWriterConfig;
import org.apache.lucene.search.IndexSearcher;
import org.apache.lucene.store.RAMDirectory;

public class GroundTruthQuality {
  static final class WSLower extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new WhitespaceTokenizer();
      return new TokenStreamComponents(t, new LowerCaseFilter(t));
    }
  }

  public static void main(String[] args) throws Exception {
    // args: maxResults; stdin: nDocs, docs "name\ttext" hex16, nQueries,
    // queries "qid\ttext" hex16, nQrels, qrel lines hex16
    int maxResults = Integer.parseInt(args[0]);
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    RAMDirectory dir = new RAMDirectory();
    IndexWriter w = new IndexWriter(dir, new IndexWriterConfig(new WSLower()));
    for (int i = 0; i < nDocs; i++) {
      String[] parts = unhex(in.readLine()).split("\t", 2);
      Document d = new Document();
      d.add(new StringField("docid", parts[0], Field.Store.YES));
      d.add(new TextField("body", parts[1], Field.Store.NO));
      w.addDocument(d);
    }
    w.close();
    int nQ = Integer.parseInt(in.readLine().trim());
    QualityQuery[] qqs = new QualityQuery[nQ];
    for (int i = 0; i < nQ; i++) {
      String[] parts = unhex(in.readLine()).split("\t", 2);
      HashMap<String, String> nv = new HashMap<>();
      nv.put("title", parts[1]);
      qqs[i] = new QualityQuery(parts[0], nv);
    }
    int nR = Integer.parseInt(in.readLine().trim());
    StringBuilder qrels = new StringBuilder();
    for (int i = 0; i < nR; i++) qrels.append(unhex(in.readLine())).append("\n");
    Judge judge = new TrecJudge(new java.io.BufferedReader(
        new StringReader(qrels.toString())));
    DirectoryReader r = DirectoryReader.open(dir);
    IndexSearcher searcher = new IndexSearcher(r);
    QualityBenchmark qb = new QualityBenchmark(
        qqs, new SimpleQQParser("title", "body"), searcher, "docid");
    qb.setMaxResults(maxResults);
    QualityStats[] stats = qb.execute(judge, null, null);
    StringBuilder sb = new StringBuilder();
    for (QualityStats st : stats) emit(sb, st);
    emit(sb, QualityStats.average(stats));
    System.out.print(sb);
  }

  static void emit(StringBuilder sb, QualityStats st) {
    sb.append(d(st.getRecall())).append(";")
      .append(d(st.getAvp())).append(";")
      .append(d(st.getMRR())).append(";")
      .append(d(st.getNumPoints())).append(";")
      .append(d(st.getNumGoodPoints())).append(";")
      .append(d(st.getMaxGoodPoints()));
    for (int j = 1; j <= 20; j++) {
      double p;
      try { p = st.getPrecisionAt(j); } catch (Exception e) { p = -1; }
      sb.append(";").append(d(p));
    }
    sb.append("\n");
  }

  static String d(double v) { return Double.toString(v); }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


MULTIFIELD_JAVA = r"""
import java.io.StringReader;
import java.util.HashMap;
import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.document.Document;
import org.apache.lucene.document.Field;
import org.apache.lucene.document.FieldType;
import org.apache.lucene.document.TextField;
import org.apache.lucene.index.DirectoryReader;
import org.apache.lucene.index.IndexWriter;
import org.apache.lucene.index.IndexWriterConfig;
import org.apache.lucene.queryparser.classic.MultiFieldQueryParser;
import org.apache.lucene.search.IndexSearcher;
import org.apache.lucene.search.Query;
import org.apache.lucene.search.ScoreDoc;
import org.apache.lucene.search.TopDocs;
import org.apache.lucene.store.RAMDirectory;

public class GroundTruthMultiField {
  static final class WSLower extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new WhitespaceTokenizer();
      return new TokenStreamComponents(t, new LowerCaseFilter(t));
    }
  }

  public static void main(String[] args) throws Exception {
    // args: k titleBoost bodyBoost ("-" "-" = no boosts map)
    //       [dismaxTie msm] (presence switches to the Solr DisMax shape:
    //       BooleanQuery of per-term DisjunctionMaxQuery over the
    //       boosted per-field TermQueries + minimumNumberShouldMatch)
    // stdin: nDocs, docs "title\tbody" hex16, then query lines hex16
    int k = Integer.parseInt(args[0]);
    HashMap<String, Float> boosts = null;
    if (!args[1].equals("-")) {
      boosts = new HashMap<>();
      boosts.put("title", Float.parseFloat(args[1]));
      boosts.put("body", Float.parseFloat(args[2]));
    }
    Float dismaxTie = args.length > 3 ? Float.parseFloat(args[3]) : null;
    int msm = args.length > 4 ? Integer.parseInt(args[4]) : 0;
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    RAMDirectory dir = new RAMDirectory();
    IndexWriter w = new IndexWriter(dir, new IndexWriterConfig(new WSLower()));
    for (int i = 0; i < nDocs; i++) {
      String[] parts = unhex(in.readLine()).split("\t", 2);
      Document d = new Document();
      d.add(new Field("title", parts[0], new FieldType(TextField.TYPE_NOT_STORED)));
      d.add(new Field("body", parts[1], new FieldType(TextField.TYPE_NOT_STORED)));
      w.addDocument(d);
    }
    w.close();
    IndexSearcher searcher = new IndexSearcher(DirectoryReader.open(dir));
    MultiFieldQueryParser qp = boosts == null
        ? new MultiFieldQueryParser(new String[] {"title", "body"}, new WSLower())
        : new MultiFieldQueryParser(new String[] {"title", "body"}, new WSLower(), boosts);
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      String text = unhex(line);
      Query q;
      if (dismaxTie == null) {
        q = qp.parse(text);
      } else {
        // the Solr DisMax main-query shape over qf fields
        org.apache.lucene.search.BooleanQuery.Builder outer =
            new org.apache.lucene.search.BooleanQuery.Builder();
        for (String tok : text.split("\\s+")) {
          if (tok.isEmpty()) continue;
          String lower = tok.toLowerCase(java.util.Locale.ROOT);
          java.util.List<Query> perField = new java.util.ArrayList<>();
          for (String f : new String[] {"title", "body"}) {
            Query tq = new org.apache.lucene.search.TermQuery(
                new org.apache.lucene.index.Term(f, lower));
            if (boosts != null && boosts.containsKey(f)) {
              tq = new org.apache.lucene.search.BoostQuery(tq, boosts.get(f));
            }
            perField.add(tq);
          }
          outer.add(new org.apache.lucene.search.DisjunctionMaxQuery(
                  perField, dismaxTie),
              org.apache.lucene.search.BooleanClause.Occur.SHOULD);
        }
        outer.setMinimumNumberShouldMatch(msm);
        q = outer.build();
      }
      TopDocs td = searcher.search(q, k);
      sb.setLength(0);
      for (ScoreDoc sd : td.scoreDocs) {
        if (sb.length() > 0) sb.append(";");
        sb.append(sd.doc).append(":").append(Float.toString(sd.score));
      }
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


PERCEPTRON_JAVA = r"""
import java.io.StringReader;
import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.classification.BooleanPerceptronClassifier;
import org.apache.lucene.classification.ClassificationResult;
import org.apache.lucene.document.Document;
import org.apache.lucene.document.Field;
import org.apache.lucene.document.FieldType;
import org.apache.lucene.document.TextField;
import org.apache.lucene.index.DirectoryReader;
import org.apache.lucene.index.IndexWriter;
import org.apache.lucene.index.IndexWriterConfig;
import org.apache.lucene.store.RAMDirectory;

public class GroundTruthPerceptron {
  static final class WSLower extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new WhitespaceTokenizer();
      return new TokenStreamComponents(t, new LowerCaseFilter(t));
    }
  }

  public static void main(String[] args) throws Exception {
    // args: batchSize threshold("-" = auto)
    // stdin: nDocs, docs "class\ttext" hex16, then probe lines hex16
    int batchSize = Integer.parseInt(args[0]);
    Double threshold = args[1].equals("-") ? null : Double.parseDouble(args[1]);
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    RAMDirectory dir = new RAMDirectory();
    IndexWriter w = new IndexWriter(dir, new IndexWriterConfig(new WSLower()));
    FieldType vecType = new FieldType(TextField.TYPE_STORED);
    vecType.setStoreTermVectors(true);
    for (int i = 0; i < nDocs; i++) {
      String[] parts = unhex(in.readLine()).split("\t", 2);
      Document d = new Document();
      d.add(new Field("cls", parts[0], new FieldType(TextField.TYPE_STORED)));
      d.add(new Field("body", parts[1], vecType));
      w.addDocument(d);
    }
    w.close();
    DirectoryReader r = DirectoryReader.open(dir);
    BooleanPerceptronClassifier c = new BooleanPerceptronClassifier(
        r.leaves().get(0).reader(), new WSLower(), null, batchSize,
        threshold, "cls", "body");
    String line;
    while ((line = in.readLine()) != null) {
      ClassificationResult<Boolean> res = c.assignClass(unhex(line));
      System.out.println(res.getAssignedClass() + ";"
          + Double.toString(res.getScore()));
    }
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


SPLITTER_JAVA = r"""
import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.classification.utils.DatasetSplitter;
import org.apache.lucene.document.Document;
import org.apache.lucene.document.Field;
import org.apache.lucene.document.FieldType;
import org.apache.lucene.document.SortedDocValuesField;
import org.apache.lucene.document.TextField;
import org.apache.lucene.index.DirectoryReader;
import org.apache.lucene.index.IndexWriter;
import org.apache.lucene.index.IndexWriterConfig;
import org.apache.lucene.store.RAMDirectory;
import org.apache.lucene.util.BytesRef;

public class GroundTruthSplitter {
  static final class WSLower extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new WhitespaceTokenizer();
      return new TokenStreamComponents(t, new LowerCaseFilter(t));
    }
  }

  public static void main(String[] args) throws Exception {
    // args: testRatio cvRatio; stdin: nDocs, docs "class\ttext" hex16
    double testRatio = Double.parseDouble(args[0]);
    double cvRatio = Double.parseDouble(args[1]);
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    RAMDirectory dir = new RAMDirectory();
    IndexWriter w = new IndexWriter(dir, new IndexWriterConfig(new WSLower()));
    for (int i = 0; i < nDocs; i++) {
      String[] parts = unhex(in.readLine()).split("\t", 2);
      Document d = new Document();
      d.add(new Field("cls", parts[0], new FieldType(TextField.TYPE_STORED)));
      d.add(new SortedDocValuesField("cls", new BytesRef(parts[0])));
      d.add(new Field("body", parts[1], new FieldType(TextField.TYPE_STORED)));
      w.addDocument(d);
    }
    w.close();
    DirectoryReader r = DirectoryReader.open(dir);
    RAMDirectory train = new RAMDirectory();
    RAMDirectory test = new RAMDirectory();
    RAMDirectory cv = new RAMDirectory();
    new DatasetSplitter(testRatio, cvRatio).split(
        r.leaves().get(0).reader(), train, test, cv, new WSLower(), false,
        "cls", "body", "cls");
    for (RAMDirectory d2 : new RAMDirectory[] {train, test, cv}) {
      DirectoryReader rr = DirectoryReader.open(d2);
      StringBuilder sb = new StringBuilder();
      for (int i = 0; i < rr.maxDoc(); i++) {
        if (sb.length() > 0) sb.append(";");
        sb.append(_hex(rr.document(i).get("body")));
      }
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
      rr.close();
    }
  }

  static String _hex(String s) throws Exception {
    StringBuilder hx = new StringBuilder();
    for (byte x : s.getBytes("UTF-16BE")) hx.append(String.format("%02x", x));
    return hx.toString();
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


CONFUSION_JAVA = r"""
import java.util.Map;
import java.util.TreeMap;
import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.core.LowerCaseFilter;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.classification.SimpleNaiveBayesClassifier;
import org.apache.lucene.classification.utils.ConfusionMatrixGenerator;
import org.apache.lucene.document.Document;
import org.apache.lucene.document.Field;
import org.apache.lucene.document.FieldType;
import org.apache.lucene.document.TextField;
import org.apache.lucene.index.DirectoryReader;
import org.apache.lucene.index.IndexWriter;
import org.apache.lucene.index.IndexWriterConfig;
import org.apache.lucene.index.LeafReader;
import org.apache.lucene.store.RAMDirectory;

public class GroundTruthConfusion {
  static final class WSLower extends Analyzer {
    protected TokenStreamComponents createComponents(String f) {
      Tokenizer t = new WhitespaceTokenizer();
      return new TokenStreamComponents(t, new LowerCaseFilter(t));
    }
  }

  public static void main(String[] args) throws Exception {
    // stdin: nDocs, docs "class\ttext" hex16
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDocs = Integer.parseInt(in.readLine().trim());
    RAMDirectory dir = new RAMDirectory();
    IndexWriter w = new IndexWriter(dir, new IndexWriterConfig(new WSLower()));
    for (int i = 0; i < nDocs; i++) {
      String[] parts = unhex(in.readLine()).split("\t", 2);
      Document d = new Document();
      d.add(new Field("cls", parts[0], new FieldType(TextField.TYPE_STORED)));
      d.add(new Field("body", parts[1], new FieldType(TextField.TYPE_STORED)));
      w.addDocument(d);
    }
    w.close();
    DirectoryReader r = DirectoryReader.open(dir);
    LeafReader leaf = r.leaves().get(0).reader();
    SimpleNaiveBayesClassifier c = new SimpleNaiveBayesClassifier(
        leaf, new WSLower(), null, "cls", "body");
    ConfusionMatrixGenerator.ConfusionMatrix m =
        ConfusionMatrixGenerator.getConfusionMatrix(leaf, c, "cls", "body", -1);
    StringBuilder sb = new StringBuilder();
    TreeMap<String, Map<String, Long>> sorted = new TreeMap<>(m.getLinearizedMatrix());
    java.util.TreeSet<String> classes = new java.util.TreeSet<>();
    for (Map.Entry<String, Map<String, Long>> e : sorted.entrySet()) {
      classes.add(e.getKey());
      TreeMap<String, Long> row = new TreeMap<>(e.getValue());
      for (Map.Entry<String, Long> f : row.entrySet()) {
        classes.add(f.getKey());
        sb.append(e.getKey()).append(":").append(f.getKey())
          .append(":").append(f.getValue()).append(";");
      }
    }
    sb.append("|").append(Double.toString(m.getAccuracy()));
    sb.append("|").append(Double.toString(m.getPrecision()));
    sb.append("|").append(Double.toString(m.getRecall()));
    sb.append("|").append(Double.toString(m.getF1Measure()));
    for (String k : classes) {
      sb.append("|").append(k).append(",")
        .append(Double.toString(m.getPrecision(k))).append(",")
        .append(Double.toString(m.getRecall(k))).append(",")
        .append(Double.toString(m.getF1Measure(k)));
    }
    System.out.println(sb);
  }

  static String unhex(String hx) throws Exception {
    if (hx.isEmpty()) return "";
    byte[] b = new byte[hx.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16);
    return new String(b, "UTF-16BE");
  }
}
"""


COMPOUND_JAVA = r"""
import java.io.StringReader;
import java.util.Arrays;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;
import org.apache.lucene.analysis.compound.DictionaryCompoundWordTokenFilter;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.OffsetAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.analysis.util.CharArraySet;

public class GroundTruthCompound {
  public static void main(String[] args) throws Exception {
    int minWord = Integer.parseInt(args[0]);
    int minSub = Integer.parseInt(args[1]);
    int maxSub = Integer.parseInt(args[2]);
    boolean longest = args[3].equals("1");
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    int nDict = Integer.parseInt(in.readLine().trim());
    java.util.List<String> words = new java.util.ArrayList<>();
    for (int i = 0; i < nDict; i++) words.add(in.readLine());
    CharArraySet dict = new CharArraySet(words, false);
    String line;
    StringBuilder sb = new StringBuilder();
    while ((line = in.readLine()) != null) {
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(line));
      TokenStream ts = new DictionaryCompoundWordTokenFilter(
          tok, dict, minWord, minSub, maxSub, longest);
      CharTermAttribute term = ts.addAttribute(CharTermAttribute.class);
      PositionIncrementAttribute pi = ts.addAttribute(PositionIncrementAttribute.class);
      OffsetAttribute off = ts.addAttribute(OffsetAttribute.class);
      ts.reset();
      sb.setLength(0);
      while (ts.incrementToken()) {
        if (sb.length() > 0) sb.append(";");
        byte[] bb = term.toString().getBytes("UTF-16BE");
        StringBuilder hx = new StringBuilder();
        for (byte x : bb) hx.append(String.format("%02x", x));
        sb.append(pi.getPositionIncrement()).append(":")
          .append(off.startOffset()).append(":")
          .append(off.endOffset()).append(":").append(hx);
      }
      ts.end(); ts.close();
      System.out.println(sb.length() == 0 ? "-" : sb.toString());
    }
  }
}
"""


MINSTEM_JAVA = r"""
import org.apache.lucene.analysis.en.EnglishMinimalStemmer;

public class GroundTruthMinStem {
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    EnglishMinimalStemmer st = new EnglishMinimalStemmer();
    String line;
    while ((line = in.readLine()) != null) {
      char[] buf = line.toCharArray();
      int n = st.stem(buf, buf.length);
      System.out.println(new String(buf, 0, n));
    }
  }
}
"""


BLOOM_JAVA = r"""
import org.apache.lucene.codecs.bloom.FuzzySet;
import org.apache.lucene.store.RAMOutputStream;
import org.apache.lucene.util.BytesRef;

public class GroundTruthBloom {
  static String hex(FuzzySet set) throws Exception {
    RAMOutputStream out = new RAMOutputStream();
    set.serialize(out);
    byte[] buf = new byte[(int) out.getFilePointer()];
    out.writeTo(buf, 0);
    StringBuilder sb = new StringBuilder();
    for (byte b : buf) sb.append(String.format("%02x", b));
    return sb.toString();
  }
  static BytesRef fromHex(String s) {
    byte[] b = new byte[s.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16);
    return new BytesRef(b);
  }
  public static void main(String[] args) throws Exception {
    java.io.BufferedReader in =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in));
    // case: "maxDoc desiredSat targetSat" / nAdd / hex... / nQuery / hex...
    String[] head = in.readLine().trim().split(" ");
    FuzzySet set = FuzzySet.createSetBasedOnQuality(
        Integer.parseInt(head[0]), Float.parseFloat(head[1]));
    int nAdd = Integer.parseInt(in.readLine().trim());
    BytesRef[] added = new BytesRef[nAdd];
    for (int i = 0; i < nAdd; i++) {
      added[i] = fromHex(in.readLine().trim());
      set.addValue(added[i]);
    }
    int nQ = Integer.parseInt(in.readLine().trim());
    BytesRef[] queries = new BytesRef[nQ];
    StringBuilder c = new StringBuilder();
    for (int i = 0; i < nQ; i++) {
      queries[i] = fromHex(in.readLine().trim());
      c.append(set.contains(queries[i]) == FuzzySet.ContainsResult.MAYBE ? '1' : '0');
    }
    System.out.println("sat " + Float.toString(set.getSaturation()));
    System.out.println("est " + set.getEstimatedUniqueValues());
    System.out.println("orig " + hex(set));
    System.out.println("contains " + (nQ == 0 ? "-" : c.toString()));
    FuzzySet down = set.downsize(Float.parseFloat(head[2]));
    if (down == null) {
      System.out.println("down null");
      System.out.println("downcontains -");
    } else {
      System.out.println("down " + hex(down));
      StringBuilder dc = new StringBuilder();
      for (int i = 0; i < nQ; i++)
        dc.append(down.contains(queries[i]) == FuzzySet.ContainsResult.MAYBE ? '1' : '0');
      System.out.println("downcontains " + (nQ == 0 ? "-" : dc.toString()));
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
    # the classic queryparser package (lucene/queryparser module) depends
    # only on core — compile it into the same classes dir
    qp_marker = os.path.join(
        CLASSES, "org/apache/lucene/queryparser/classic/QueryParser.class"
    )
    qp_src = "/root/reference/lucene/queryparser/src/java/org/apache/lucene/queryparser/classic"
    if not os.path.exists(qp_marker) and os.path.isdir(qp_src):
        qsrcs = [
            os.path.join(qp_src, f) for f in os.listdir(qp_src) if f.endswith(".java")
        ]
        # QueryParserBase implements flexible.standard.CommonQueryParserConfiguration
        flex = "/root/reference/lucene/queryparser/src/java/org/apache/lucene/queryparser/flexible/standard/CommonQueryParserConfiguration.java"
        if os.path.exists(flex):
            qsrcs.append(flex)
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + qsrcs,
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the queries module (PayloadScoreQuery, SpanPayloadCheckQuery, ...)
    # depends only on core
    pay_marker = os.path.join(
        CLASSES, "org/apache/lucene/queries/payloads/PayloadScoreQuery.class"
    )
    q_root = "/root/reference/lucene/queries/src/java"
    if not os.path.exists(pay_marker) and os.path.isdir(q_root):
        qsrcs2 = os.path.join(BUILD, "qsrcs.txt")
        with open(qsrcs2, "w") as f:
            for root, _dirs, files in os.walk(q_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + qsrcs2],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # sandbox SlowFuzzyQuery (+ its TermsEnum) depends only on core
    sf_marker = os.path.join(
        CLASSES, "org/apache/lucene/sandbox/queries/SlowFuzzyQuery.class"
    )
    sf_dir = "/root/reference/lucene/sandbox/src/java/org/apache/lucene/sandbox/queries"
    if not os.path.exists(sf_marker) and os.path.isdir(sf_dir):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             os.path.join(sf_dir, "SlowFuzzyQuery.java"),
             os.path.join(sf_dir, "SlowFuzzyTermsEnum.java"),
             os.path.join(os.path.dirname(os.path.dirname(sf_dir)),
                          "search", "DocValuesTermsQuery.java"),
             os.path.join(os.path.dirname(os.path.dirname(sf_dir)),
                          "search", "DocValuesNumbersQuery.java"),
             os.path.join(os.path.dirname(os.path.dirname(sf_dir)),
                          "search", "DocValuesRangeQuery.java")],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # sandbox FuzzyLikeThisQuery (GT round 29c) — rides the compiled
    # SlowFuzzyTermsEnum + queries-module ClassicSimilarity
    flt_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/sandbox/queries/FuzzyLikeThisQuery.class",
    )
    if not os.path.exists(flt_marker) and os.path.isdir(sf_dir):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             os.path.join(sf_dir, "FuzzyLikeThisQuery.java")],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # lucene/spatial (geopoint morton terms + util) depends only on core
    gp_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/spatial/geopoint/document/GeoPointField.class",
    )
    gp_root = "/root/reference/lucene/spatial/src/java"
    if not os.path.exists(gp_marker) and os.path.isdir(gp_root):
        gpsrcs = os.path.join(BUILD, "gpsrcs.txt")
        with open(gpsrcs, "w") as f:
            for root, _dirs, files in os.walk(gp_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + gpsrcs],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # suggest/document (SuggestField + NRTSuggester completion family)
    # depends on core + suggest (FSTUtil); the Completion50 postings
    # format must also be registered with SPI in the merged META-INF
    cq_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/search/suggest/document/NRTSuggester.class",
    )
    cq_dir = ("/root/reference/lucene/suggest/src/java/org/apache/lucene/"
              "search/suggest/document")
    if not os.path.exists(cq_marker) and os.path.isdir(cq_dir):
        csrcs = [os.path.join(cq_dir, f) for f in os.listdir(cq_dir)
                 if f.endswith(".java")]
        bp = os.path.join(os.path.dirname(cq_dir), "BitsProducer.java")
        if os.path.exists(bp):
            csrcs.append(bp)
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + csrcs,
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    spi = os.path.join(
        CLASSES, "META-INF/services/org.apache.lucene.codecs.PostingsFormat")
    spi_line = "org.apache.lucene.search.suggest.document.Completion50PostingsFormat"
    if os.path.exists(spi):
        with open(spi) as f:
            have = f.read()
        if spi_line not in have:
            with open(spi, "a") as f:
                f.write("\n" + spi_line + "\n")
    # lucene/spatial3d depends only on core
    g3_marker = os.path.join(
        CLASSES, "org/apache/lucene/spatial3d/Geo3DPoint.class")
    g3_root = "/root/reference/lucene/spatial3d/src/java"
    if not os.path.exists(g3_marker) and os.path.isdir(g3_root):
        g3srcs = os.path.join(BUILD, "g3srcs.txt")
        with open(g3srcs, "w") as f:
            for root, _dirs, files in os.walk(g3_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + g3srcs],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # lucene/misc index splitters depend only on core
    sp2_marker = os.path.join(
        CLASSES, "org/apache/lucene/index/PKIndexSplitter.class")
    mi_dir = "/root/reference/lucene/misc/src/java/org/apache/lucene/index"
    if not os.path.exists(sp2_marker) and os.path.isdir(mi_dir):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             os.path.join(mi_dir, "PKIndexSplitter.java"),
             os.path.join(mi_dir, "MultiPassIndexSplitter.java")],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # SweetSpotSimilarity (lucene/misc) depends only on core
    ss_marker = os.path.join(
        CLASSES, "org/apache/lucene/misc/SweetSpotSimilarity.class"
    )
    ss_src = (
        "/root/reference/lucene/misc/src/java/org/apache/lucene/misc/"
        "SweetSpotSimilarity.java"
    )
    if not os.path.exists(ss_marker) and os.path.exists(ss_src):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, ss_src],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the spell package (lucene/suggest) depends only on core
    sp_marker = os.path.join(
        CLASSES, "org/apache/lucene/search/spell/DirectSpellChecker.class"
    )
    sp_dir = (
        "/root/reference/lucene/suggest/src/java/org/apache/lucene/search/spell"
    )
    if not os.path.exists(sp_marker) and os.path.isdir(sp_dir):
        # only the checker classes — the Dictionary family pulls in the
        # suggest package's InputIterator (FST surface), not needed here
        spell_files = [
            "DirectSpellChecker.java", "WordBreakSpellChecker.java",
            "CombineSuggestion.java", "SuggestWord.java",
            "SuggestWordQueue.java", "SuggestMode.java",
            "SuggestWordScoreComparator.java",
            "SuggestWordFrequencyComparator.java", "StringDistance.java",
            "LevensteinDistance.java", "LuceneLevenshteinDistance.java",
            "JaroWinklerDistance.java", "NGramDistance.java",
            "SpellChecker.java", "Dictionary.java",
        ]
        ssrcs = [os.path.join(sp_dir, f) for f in spell_files]
        # Dictionary's InputIterator lives one package over (suggest/).
        # Its 4 `// javadocs`-only imports pull the whole FST suggester
        # tree — compile a copy with those import LINES stripped (a build
        # shim; no code changes).
        ii_src = os.path.join(sp_dir, "..", "suggest", "InputIterator.java")
        ii_tmp = os.path.join(BUILD, "InputIterator.java")
        with open(ii_src) as f:
            ii_code = "".join(
                ln for ln in f if not ("import " in ln and "// javadocs" in ln)
            )
        with open(ii_tmp, "w") as f:
            f.write(ii_code)
        ssrcs.append(ii_tmp)
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + ssrcs,
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # lucene/grouping depends only on core
    gr_marker = os.path.join(
        CLASSES, "org/apache/lucene/search/grouping/GroupingSearch.class"
    )
    gr_root = "/root/reference/lucene/grouping/src/java"
    if not os.path.exists(gr_marker) and os.path.isdir(gr_root):
        gsrcs = os.path.join(BUILD, "gsrcs.txt")
        with open(gsrcs, "w") as f:
            for root, _dirs, files in os.walk(gr_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + gsrcs],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # lucene/classification depends on core + queries (both above)
    cl_marker = os.path.join(
        CLASSES, "org/apache/lucene/classification/SimpleNaiveBayesClassifier.class"
    )
    cl_root = "/root/reference/lucene/classification/src/java"
    if not os.path.exists(cl_marker) and os.path.isdir(cl_root):
        csrcs = os.path.join(BUILD, "csrcs.txt")
        with open(csrcs, "w") as f:
            for root, _dirs, files in os.walk(cl_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + csrcs],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # TermAutomatonQuery/-Scorer (lucene/sandbox) depend only on core
    ta_marker = os.path.join(
        CLASSES, "org/apache/lucene/search/TermAutomatonQuery.class"
    )
    ta_dir = (
        "/root/reference/lucene/sandbox/src/java/org/apache/lucene/search"
    )
    if not os.path.exists(ta_marker) and os.path.isdir(ta_dir):
        tsrcs = [
            os.path.join(ta_dir, f)
            for f in ("TermAutomatonQuery.java", "TermAutomatonScorer.java")
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + tsrcs,
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # lucene/memory (MemoryIndex) depends only on core
    mi_marker = os.path.join(
        CLASSES, "org/apache/lucene/index/memory/MemoryIndex.class"
    )
    mi_dir = (
        "/root/reference/lucene/memory/src/java/org/apache/lucene/index/memory"
    )
    if not os.path.exists(mi_marker) and os.path.isdir(mi_dir):
        msrcs = [
            os.path.join(mi_dir, f) for f in os.listdir(mi_dir)
            if f.endswith(".java")
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + msrcs,
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the postings highlighter package (lucene/highlighter) needs core only
    hl_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/search/postingshighlight/PostingsHighlighter.class",
    )
    hl_dir = (
        "/root/reference/lucene/highlighter/src/java/org/apache/lucene/"
        "search/postingshighlight"
    )
    if not os.path.exists(hl_marker) and os.path.isdir(hl_dir):
        hsrcs = [
            os.path.join(hl_dir, f) for f in os.listdir(hl_dir)
            if f.endswith(".java")
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + hsrcs,
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # DiversifiedTopDocsCollector (lucene/misc) depends only on core
    dv_marker = os.path.join(
        CLASSES, "org/apache/lucene/search/DiversifiedTopDocsCollector.class"
    )
    dv_src = (
        "/root/reference/lucene/misc/src/java/org/apache/lucene/search/"
        "DiversifiedTopDocsCollector.java"
    )
    if not os.path.exists(dv_marker) and os.path.exists(dv_src):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, dv_src],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the complexPhrase parser (queryparser module) needs classic + core
    cx_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/queryparser/complexPhrase/ComplexPhraseQueryParser.class",
    )
    cx_src = (
        "/root/reference/lucene/queryparser/src/java/org/apache/lucene/"
        "queryparser/complexPhrase/ComplexPhraseQueryParser.java"
    )
    if not os.path.exists(cx_marker) and os.path.exists(cx_src):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, cx_src],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the simple parser (queryparser module) needs core only
    sq_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/queryparser/simple/SimpleQueryParser.class",
    )
    sq_src = (
        "/root/reference/lucene/queryparser/src/java/org/apache/lucene/"
        "queryparser/simple/SimpleQueryParser.java"
    )
    if not os.path.exists(sq_marker) and os.path.exists(sq_src):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, sq_src],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the xml parser (queryparser module): CoreParser + its builder set
    # (the CorePlus* extras need sandbox/queries builders we don't pin)
    xq_marker = os.path.join(
        CLASSES, "org/apache/lucene/queryparser/xml/CoreParser.class"
    )
    xq_root = (
        "/root/reference/lucene/queryparser/src/java/org/apache/lucene/"
        "queryparser/xml"
    )
    if not os.path.exists(xq_marker) and os.path.isdir(xq_root):
        xq_files = [
            "CoreParser.java", "DOMUtils.java", "ParserException.java",
            "QueryBuilder.java", "QueryBuilderFactory.java",
        ]
        xq_builders = [
            "TermQueryBuilder.java", "TermsQueryBuilder.java",
            "MatchAllDocsQueryBuilder.java", "BooleanQueryBuilder.java",
            "LegacyNumericRangeQueryBuilder.java",
            "PointRangeQueryBuilder.java", "RangeQueryBuilder.java",
            "DisjunctionMaxQueryBuilder.java", "UserInputQueryBuilder.java",
            "ConstantScoreQueryBuilder.java", "SpanBuilderBase.java",
            "SpanQueryBuilder.java", "SpanQueryBuilderFactory.java",
            "SpanNearBuilder.java", "BoostingTermBuilder.java",
            "SpanTermBuilder.java", "SpanOrBuilder.java",
            "SpanOrTermsBuilder.java", "SpanFirstBuilder.java",
            "SpanNotBuilder.java",
        ]
        xsrcs = [os.path.join(xq_root, f) for f in xq_files] + [
            os.path.join(xq_root, "builders", f) for f in xq_builders
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + xsrcs,
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # CorePlusQueriesParser (GT round 29b): LikeThisQueryBuilder +
    # BoostingQueryBuilder over the queries module (MoreLikeThisQuery /
    # BoostingQuery resolve via sourcepath)
    xp_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/queryparser/xml/CorePlusQueriesParser.class",
    )
    if not os.path.exists(xp_marker) and os.path.isdir(xq_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/queryparser/src/java:"
             "/root/reference/lucene/queries/src/java",
             os.path.join(xq_root, "CorePlusQueriesParser.java"),
             os.path.join(xq_root, "builders", "LikeThisQueryBuilder.java"),
             os.path.join(xq_root, "builders", "BoostingQueryBuilder.java")],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the REAL StandardAnalyzer chain (analysis/common standard package +
    # its core/util deps) — the deepest tokenizer pin possible
    st_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/standard/StandardAnalyzer.class"
    )
    ac_root = (
        "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/"
        "analysis"
    )
    if not os.path.exists(st_marker) and os.path.isdir(ac_root):
        st_files = [
            "standard/StandardTokenizer.java",
            "standard/StandardTokenizerImpl.java",
            "standard/StandardFilter.java", "standard/StandardAnalyzer.java",
            "core/LowerCaseFilter.java", "core/StopFilter.java",
            "core/StopAnalyzer.java", "core/WhitespaceTokenizer.java",
            "core/LetterTokenizer.java", "core/LowerCaseTokenizer.java",
            "core/UnicodeWhitespaceTokenizer.java",
            "util/StopwordAnalyzerBase.java", "util/CharTokenizer.java",
            "util/WordlistLoader.java", "util/CharArraySet.java",
            "util/CharArrayMap.java", "util/CharacterUtils.java",
            "util/FilteringTokenFilter.java", "util/UnicodeProps.java",
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + [os.path.join(ac_root, f) for f in st_files],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # lucene/facet depends only on core
    fc_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/facet/sortedset/SortedSetDocValuesFacetCounts.class",
    )
    fc_root = "/root/reference/lucene/facet/src/java"
    if not os.path.exists(fc_marker) and os.path.isdir(fc_root):
        fsrcs = os.path.join(BUILD, "fsrcs.txt")
        with open(fsrcs, "w") as f:
            for root, _dirs, files in os.walk(fc_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + fsrcs],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the surround parser (queryparser module) needs core only
    sr_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/queryparser/surround/parser/QueryParser.class",
    )
    sr_root = (
        "/root/reference/lucene/queryparser/src/java/org/apache/lucene/"
        "queryparser/surround"
    )
    if not os.path.exists(sr_marker) and os.path.isdir(sr_root):
        rsrcs = os.path.join(BUILD, "rsrcs.txt")
        with open(rsrcs, "w") as f:
            for root, _dirs, files in os.walk(sr_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + rsrcs],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the Porter stemmer pair (analysis/common en package) needs core only
    po_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/en/PorterStemFilter.class"
    )
    po_dir = (
        "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/"
        "analysis/en"
    )
    if not os.path.exists(po_marker) and os.path.isdir(po_dir):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             os.path.join(po_dir, "PorterStemmer.java"),
             os.path.join(po_dir, "PorterStemFilter.java")],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # lucene/join depends only on core
    jn_marker = os.path.join(
        CLASSES, "org/apache/lucene/search/join/ToParentBlockJoinQuery.class"
    )
    jn_root = "/root/reference/lucene/join/src/java"
    if not os.path.exists(jn_marker) and os.path.isdir(jn_root):
        jsrcs = os.path.join(BUILD, "jsrcs.txt")
        with open(jsrcs, "w") as f:
            for root, _dirs, files in os.walk(jn_root):
                for fn in files:
                    if fn.endswith(".java"):
                        f.write(os.path.join(root, fn) + "\n")
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, "@" + jsrcs],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # LatLonPoint and friends (lucene/sandbox document package; core deps)
    ll_marker = os.path.join(
        CLASSES, "org/apache/lucene/document/LatLonPoint.class"
    )
    ll_dir = (
        "/root/reference/lucene/sandbox/src/java/org/apache/lucene/document"
    )
    if not os.path.exists(ll_marker) and os.path.isdir(ll_dir):
        lsrcs = [
            os.path.join(ll_dir, f)
            for f in (
                "LatLonPoint.java", "LatLonDocValuesField.java",
                "LatLonPointBoxQuery.java", "LatLonPointDistanceQuery.java",
                "LatLonPointDistanceComparator.java",
                "LatLonPointSortField.java", "MatchingPoints.java",
                "NearestNeighbor.java", "LatLonPointInPolygonQuery.java",
            )
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + lsrcs,
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # FreeTextSuggester (suggest/analyzing) + its two cross-package deps:
    # Lookup (suggest/) and ShingleFilter (analysis/common's shingle
    # package — self-contained on core). InputIterator comes from the
    # spell block's stripped copy above.
    ft_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/search/suggest/analyzing/FreeTextSuggester.class",
    )
    sug_root = "/root/reference/lucene/suggest/src/java/org/apache/lucene/search/suggest"
    if not os.path.exists(ft_marker) and os.path.isdir(sug_root):
        fsrcs = [
            "/root/reference/lucene/analysis/common/src/java/org/apache/"
            "lucene/analysis/shingle/ShingleFilter.java",
            os.path.join(sug_root, "Lookup.java"),
            os.path.join(sug_root, "analyzing", "FreeTextSuggester.java"),
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + fsrcs,
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the infix suggesters (suggest/analyzing) — need core +
    # analysis/common's EdgeNGramTokenFilter (compiled above)
    bi_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/search/suggest/analyzing/BlendedInfixSuggester.class",
    )
    if not os.path.exists(bi_marker) and os.path.isdir(sug_root):
        # -sourcepath resolves analysis/ngram on a cold cache (the ngram
        # classes also compile explicitly further down; either order works)
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             os.path.join(sug_root, "analyzing", "AnalyzingInfixSuggester.java"),
             os.path.join(sug_root, "analyzing", "BlendedInfixSuggester.java")],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the FST completion-lookup family (suggest/fst + analyzing's
    # Analyzing/Fuzzy suggesters); FSTUtil + the sorter plumbing and the
    # tst/jaspell legacy lookups come along as compile deps
    sg_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/search/suggest/analyzing/AnalyzingSuggester.class",
    )
    if not os.path.exists(sg_marker) and os.path.isdir(sug_root):
        gsrcs = (
            [os.path.join(sug_root, f) for f in (
                "SortedInputIterator.java", "InMemorySorter.java",
            )]
            + [os.path.join(sug_root, "analyzing", "FSTUtil.java")]
            + sorted(
                os.path.join(sug_root, "tst", f)
                for f in os.listdir(os.path.join(sug_root, "tst"))
                if f.endswith(".java")
            )
            + sorted(
                os.path.join(sug_root, "jaspell", f)
                for f in os.listdir(os.path.join(sug_root, "jaspell"))
                if f.endswith(".java")
            )
            + sorted(
                os.path.join(sug_root, "fst", f)
                for f in os.listdir(os.path.join(sug_root, "fst"))
                if f.endswith(".java")
            )
            + [
                os.path.join(sug_root, "analyzing", "AnalyzingSuggester.java"),
                os.path.join(sug_root, "analyzing", "FuzzySuggester.java"),
            ]
        )
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + gsrcs,
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # AnalyzingQueryParser (queryparser/analyzing) extends the classic
    # parser (compiled above)
    aq_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/queryparser/analyzing/AnalyzingQueryParser.class",
    )
    aq_src = (
        "/root/reference/lucene/queryparser/src/java/org/apache/lucene/"
        "queryparser/analyzing/AnalyzingQueryParser.java"
    )
    if not os.path.exists(aq_marker) and os.path.exists(aq_src):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, aq_src],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the flexible query parser (queryparser/flexible — StandardQueryParser
    # + its core framework) needs lucene-core only
    fx_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/queryparser/flexible/standard/"
        "StandardQueryParser.class",
    )
    fx_root = (
        "/root/reference/lucene/queryparser/src/java/org/apache/lucene/"
        "queryparser/flexible"
    )
    if not os.path.exists(fx_marker) and os.path.isdir(fx_root):
        fsrcs = []
        for dirpath, _dirs, files in os.walk(fx_root):
            fsrcs.extend(
                os.path.join(dirpath, f) for f in files if f.endswith(".java")
            )
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + sorted(fsrcs),
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the classic highlight package (lucene/highlighter search/highlight)
    # needs core + memory + queries + join (all compiled above)
    chl_marker = os.path.join(
        CLASSES, "org/apache/lucene/search/highlight/Highlighter.class"
    )
    chl_dir = (
        "/root/reference/lucene/highlighter/src/java/org/apache/lucene/"
        "search/highlight"
    )
    if not os.path.exists(chl_marker) and os.path.isdir(chl_dir):
        csrcs = [
            os.path.join(chl_dir, f) for f in os.listdir(chl_dir)
            if f.endswith(".java")
        ] + [
            # TokenSources' one analysis/common dependency
            "/root/reference/lucene/analysis/common/src/java/org/apache/"
            "lucene/analysis/miscellaneous/LimitTokenOffsetFilter.java"
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + csrcs,
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # FastVectorHighlighter (lucene/highlighter vectorhighlight) needs
    # core + search/highlight (Encoder/DefaultEncoder, compiled above)
    fvh_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/search/vectorhighlight/FastVectorHighlighter.class",
    )
    fvh_dir = (
        "/root/reference/lucene/highlighter/src/java/org/apache/lucene/"
        "search/vectorhighlight"
    )
    if not os.path.exists(fvh_marker) and os.path.isdir(fvh_dir):
        vsrcs = [
            os.path.join(fvh_dir, f) for f in os.listdir(fvh_dir)
            if f.endswith(".java")
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + vsrcs,
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # the bloom codec trio (lucene/codecs bloom package) needs core only;
    # BloomFilteringPostingsFormat itself stays uncompiled (SPI plumbing
    # the FuzzySet pin doesn't need)
    bl_marker = os.path.join(
        CLASSES, "org/apache/lucene/codecs/bloom/FuzzySet.class"
    )
    bl_dir = (
        "/root/reference/lucene/codecs/src/java/org/apache/lucene/codecs/bloom"
    )
    if not os.path.exists(bl_marker) and os.path.isdir(bl_dir):
        bsrcs = [
            os.path.join(bl_dir, f)
            for f in ("FuzzySet.java", "HashFunction.java", "MurmurHash2.java")
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + bsrcs,
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # ASCIIFoldingFilter + EnglishPossessiveFilter (analysis/common
    # miscellaneous + en) need core only
    af_marker = os.path.join(
        CLASSES,
        "org/apache/lucene/analysis/compound/DictionaryCompoundWordTokenFilter.class",
    )
    ac_root = (
        "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis"
    )
    if not os.path.exists(af_marker) and os.path.isdir(ac_root):
        asrcs = [
            f"{ac_root}/miscellaneous/ASCIIFoldingFilter.java",
            f"{ac_root}/en/EnglishPossessiveFilter.java",
            f"{ac_root}/en/EnglishMinimalStemmer.java",
            f"{ac_root}/miscellaneous/WordDelimiterFilter.java",
            f"{ac_root}/miscellaneous/WordDelimiterIterator.java",
            f"{ac_root}/synonym/SynonymFilter.java",
            f"{ac_root}/synonym/SynonymMap.java",
            f"{ac_root}/synonym/SolrSynonymParser.java",
            f"{ac_root}/synonym/WordnetSynonymParser.java",
            f"{ac_root}/compound/CompoundWordTokenFilterBase.java",
            f"{ac_root}/compound/DictionaryCompoundWordTokenFilter.java",
        ]
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES] + asrcs,
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # CommonGramsFilter pair (analysis/common commongrams) needs core +
    # the already-compiled CharArraySet
    cg_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/commongrams/CommonGramsFilter.class"
    )
    if not os.path.exists(cg_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             f"{ac_root}/commongrams/CommonGramsFilter.java",
             f"{ac_root}/commongrams/CommonGramsQueryFilter.java"],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # ReversedWildcardFilter(+Factory) live in solr/core but depend only
    # on lucene core + analysis/common; -sourcepath lets javac pull the
    # factory framework (AbstractAnalysisFactory, AnalysisSPILoader,
    # ResourceLoader) transitively
    rw_marker = os.path.join(
        CLASSES, "org/apache/solr/analysis/ReversedWildcardFilterFactory.class"
    )
    solr_root = "/root/reference/solr/core/src/java"
    if not os.path.exists(rw_marker) and os.path.isdir(solr_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             f"/root/reference/lucene/analysis/common/src/java:{solr_root}",
             f"{solr_root}/org/apache/solr/analysis/ReversedWildcardFilter.java",
             f"{solr_root}/org/apache/solr/analysis/ReversedWildcardFilterFactory.java",
             f"{ac_root}/reverse/ReverseStringFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # CJKWidthFilter + CJKBigramFilter (analysis/common cjk) — core +
    # the standard tokenizer + StemmerUtil, all resolvable via sourcepath
    cjk_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/cjk/CJKBigramFilter.class"
    )
    if not os.path.exists(cjk_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/cjk/CJKWidthFilter.java",
             f"{ac_root}/cjk/CJKBigramFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # char filters (analysis/common charfilter + pattern packages) —
    # FST/RollingCharBuffer deps resolve via sourcepath against core
    cf_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/charfilter/MappingCharFilter.class"
    )
    if not os.path.exists(cf_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/charfilter/BaseCharFilter.java",
             f"{ac_root}/charfilter/NormalizeCharMap.java",
             f"{ac_root}/charfilter/MappingCharFilter.java",
             f"{ac_root}/pattern/PatternReplaceCharFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # miscellaneous filter pack (GT round 55) — Trim/Length/Truncate/
    # Capitalization/KeepWord/Hyphenated/Fingerprint/CodepointCount/
    # Decimal/Scandinavian/Limit*/UpperCase/Apostrophe; deps (CharArraySet,
    # StemmerUtil, FilteringTokenFilter, CharacterUtils) resolve via
    # sourcepath + the compiled core
    misc_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/miscellaneous/FingerprintFilter.class"
    )
    if not os.path.exists(misc_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/miscellaneous/TrimFilter.java",
             f"{ac_root}/miscellaneous/LengthFilter.java",
             f"{ac_root}/miscellaneous/TruncateTokenFilter.java",
             f"{ac_root}/miscellaneous/CapitalizationFilter.java",
             f"{ac_root}/miscellaneous/KeepWordFilter.java",
             f"{ac_root}/miscellaneous/HyphenatedWordsFilter.java",
             f"{ac_root}/miscellaneous/FingerprintFilter.java",
             f"{ac_root}/miscellaneous/CodepointCountFilter.java",
             f"{ac_root}/miscellaneous/ScandinavianFoldingFilter.java",
             f"{ac_root}/miscellaneous/ScandinavianNormalizationFilter.java",
             f"{ac_root}/miscellaneous/LimitTokenCountFilter.java",
             f"{ac_root}/miscellaneous/LimitTokenOffsetFilter.java",
             f"{ac_root}/miscellaneous/LimitTokenPositionFilter.java",
             f"{ac_root}/core/DecimalDigitFilter.java",
             f"{ac_root}/core/KeywordTokenizer.java",
             f"{ac_root}/core/UpperCaseFilter.java",
             f"{ac_root}/tr/ApostropheFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # HTMLStripCharFilter (GT round 57) — the generated jflex scanner
    # compiles against BaseCharFilter + OpenStringBuilder via sourcepath
    hs_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/charfilter/HTMLStripCharFilter.class"
    )
    if not os.path.exists(hs_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/charfilter/HTMLStripCharFilter.java"],
            capture_output=True, text=True, timeout=300,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # ClassicTokenizer (GT round 58) — the pre-3.1 standard grammar
    ct_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/standard/ClassicTokenizer.class"
    )
    if not os.path.exists(ct_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/standard/ClassicTokenizer.java",
             f"{ac_root}/standard/ClassicTokenizerImpl.java",
             f"{ac_root}/standard/ClassicFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # benchmark/quality (GT round 60) — QualityBenchmark + TrecJudge +
    # QualityStats; SimpleQQParser resolves against the compiled
    # queryparser classic
    qb_root = "/root/reference/lucene/benchmark/src/java/org/apache/lucene/benchmark"
    qb_marker = os.path.join(
        CLASSES, "org/apache/lucene/benchmark/quality/QualityBenchmark.class"
    )
    if not os.path.exists(qb_marker) and os.path.isdir(qb_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/benchmark/src/java",
             f"{qb_root}/quality/Judge.java",
             f"{qb_root}/quality/QualityQuery.java",
             f"{qb_root}/quality/QualityQueryParser.java",
             f"{qb_root}/quality/QualityStats.java",
             f"{qb_root}/quality/QualityBenchmark.java",
             f"{qb_root}/quality/trec/TrecJudge.java",
             f"{qb_root}/quality/utils/SimpleQQParser.java",
             f"{qb_root}/quality/utils/DocNameExtractor.java",
             f"{qb_root}/quality/utils/SubmissionReport.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # QueryAutoStopWordAnalyzer (GT round 59)
    qa_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/query/QueryAutoStopWordAnalyzer.class"
    )
    if not os.path.exists(qa_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/query/QueryAutoStopWordAnalyzer.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # snowball (GT round 56): org.tartarus.snowball program + the English
    # (Porter2) generated stemmer + the SnowballFilter wrapper
    sn_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/tr/TurkishAnalyzer.class"
    )
    if not os.path.exists(sn_marker) and os.path.isdir(ac_root):
        tart = "/root/reference/lucene/analysis/common/src/java/org/tartarus/snowball"
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{tart}/Among.java",
             f"{tart}/SnowballProgram.java",
             f"{tart}/ext/EnglishStemmer.java",
             f"{tart}/ext/German2Stemmer.java",
             f"{tart}/ext/FrenchStemmer.java",
             f"{tart}/ext/SpanishStemmer.java",
             f"{tart}/ext/ItalianStemmer.java",
             f"{tart}/ext/DutchStemmer.java",
             f"{tart}/ext/RussianStemmer.java",
             f"{tart}/ext/NorwegianStemmer.java",
             f"{tart}/ext/DanishStemmer.java",
             f"{tart}/ext/SwedishStemmer.java",
             f"{tart}/ext/PortugueseStemmer.java",
             f"{tart}/ext/FinnishStemmer.java",
             f"{tart}/ext/HungarianStemmer.java",
             f"{tart}/ext/RomanianStemmer.java",
             f"{tart}/ext/TurkishStemmer.java",
             f"{tart}/ext/CatalanStemmer.java",
             f"{tart}/ext/BasqueStemmer.java",
             f"{tart}/ext/IrishStemmer.java",
             f"{tart}/ext/ArmenianStemmer.java",
             f"{ac_root}/snowball/SnowballFilter.java",
             f"{ac_root}/fr/FrenchAnalyzer.java",
             f"{ac_root}/fr/FrenchLightStemFilter.java",
             f"{ac_root}/de/GermanAnalyzer.java",
             f"{ac_root}/de/GermanNormalizationFilter.java",
             f"{ac_root}/de/GermanLightStemFilter.java",
             f"{ac_root}/it/ItalianAnalyzer.java",
             f"{ac_root}/it/ItalianLightStemFilter.java",
             f"{ac_root}/es/SpanishAnalyzer.java",
             f"{ac_root}/es/SpanishLightStemFilter.java",
             f"{ac_root}/ru/RussianAnalyzer.java",
             f"{ac_root}/nl/DutchAnalyzer.java",
             f"{ac_root}/pt/PortugueseAnalyzer.java",
             f"{ac_root}/pt/PortugueseLightStemFilter.java",
             f"{ac_root}/ar/ArabicAnalyzer.java",
             f"{ac_root}/cz/CzechAnalyzer.java",
             f"{ac_root}/fa/PersianAnalyzer.java",
             f"{ac_root}/el/GreekAnalyzer.java",
             f"{ac_root}/el/GreekLowerCaseFilter.java",
             f"{ac_root}/el/GreekStemFilter.java",
             f"{ac_root}/hi/HindiAnalyzer.java",
             f"{ac_root}/bg/BulgarianAnalyzer.java",
             f"{ac_root}/id/IndonesianAnalyzer.java",
             f"{ac_root}/lv/LatvianAnalyzer.java",
             f"{ac_root}/ckb/SoraniAnalyzer.java",
             f"{ac_root}/ckb/SoraniNormalizationFilter.java",
             f"{ac_root}/ckb/SoraniStemFilter.java",
             f"{ac_root}/fi/FinnishAnalyzer.java",
             f"{ac_root}/tr/TurkishAnalyzer.java",
             f"{ac_root}/tr/ApostropheFilter.java",
             f"{ac_root}/tr/TurkishLowerCaseFilter.java",
             f"{ac_root}/hu/HungarianAnalyzer.java",
             f"{ac_root}/ro/RomanianAnalyzer.java",
             f"{ac_root}/ca/CatalanAnalyzer.java",
             f"{ac_root}/eu/BasqueAnalyzer.java",
             f"{ac_root}/ga/IrishAnalyzer.java",
             f"{ac_root}/ga/IrishLowerCaseFilter.java",
             f"{ac_root}/hy/ArmenianAnalyzer.java",
             f"{ac_root}/util/ElisionFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
        # FrenchAnalyzer loads its stop set from the snowball resource dir
        res_src = ("/root/reference/lucene/analysis/common/src/resources/"
                   "org/apache/lucene/analysis/snowball")
        res_dst = os.path.join(CLASSES, "org/apache/lucene/analysis/snowball")
        if os.path.isdir(res_src):
            os.makedirs(res_dst, exist_ok=True)
            for fn in os.listdir(res_src):
                if fn.endswith(".txt"):
                    shutil.copy(os.path.join(res_src, fn),
                                os.path.join(res_dst, fn))
        # package-local stopword resources (tr/ro/ca/eu/ga/hy load
        # stopwords.txt from their own package dir)
        pkg_res_root = ("/root/reference/lucene/analysis/common/src/"
                        "resources/org/apache/lucene/analysis")
        for pkg in ("tr", "ro", "ca", "eu", "ga", "hy"):
            src_dir = os.path.join(pkg_res_root, pkg)
            dst_dir = os.path.join(
                CLASSES, "org/apache/lucene/analysis", pkg)
            if os.path.isdir(src_dir):
                os.makedirs(dst_dir, exist_ok=True)
                for fn in os.listdir(src_dir):
                    if fn.endswith(".txt"):
                        shutil.copy(os.path.join(src_dir, fn),
                                    os.path.join(dst_dir, fn))
    # keyword-marker cluster (miscellaneous): KeywordRepeat +
    # SetKeywordMarker + RemoveDuplicates — KeywordAttribute + the
    # already-compiled PorterStemFilter
    km_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/miscellaneous/KeywordRepeatFilter.class"
    )
    if not os.path.exists(km_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/miscellaneous/KeywordRepeatFilter.java",
             f"{ac_root}/miscellaneous/KeywordMarkerFilter.java",
             f"{ac_root}/miscellaneous/SetKeywordMarkerFilter.java",
             f"{ac_root}/miscellaneous/RemoveDuplicatesTokenFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # stempel (Egothor) Polish: org.egothor.stemmer tries + StempelFilter
    # + PolishAnalyzer, with the in-tree stemmer_20000.tbl/stopwords.txt
    # resources on the classpath
    stp_root = "/root/reference/lucene/analysis/stempel/src/java"
    stp_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/pl/PolishAnalyzer.class"
    )
    if not os.path.exists(stp_marker) and os.path.isdir(stp_root):
        eg = f"{stp_root}/org/egothor/stemmer"
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             f"{stp_root}:/root/reference/lucene/analysis/common/src/java",
             f"{eg}/Cell.java", f"{eg}/Row.java", f"{eg}/Trie.java",
             f"{eg}/MultiTrie.java", f"{eg}/MultiTrie2.java",
             f"{eg}/Diff.java", f"{eg}/Gener.java", f"{eg}/Lift.java",
             f"{eg}/Optimizer.java", f"{eg}/Optimizer2.java",
             f"{eg}/Reduce.java",
             f"{stp_root}/org/apache/lucene/analysis/stempel/StempelStemmer.java",
             f"{stp_root}/org/apache/lucene/analysis/stempel/StempelFilter.java",
             f"{stp_root}/org/apache/lucene/analysis/pl/PolishAnalyzer.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
        stp_res = ("/root/reference/lucene/analysis/stempel/src/resources/"
                   "org/apache/lucene/analysis/pl")
        stp_dst = os.path.join(CLASSES, "org/apache/lucene/analysis/pl")
        os.makedirs(stp_dst, exist_ok=True)
        for fn in ("stemmer_20000.tbl", "stopwords.txt"):
            shutil.copy(os.path.join(stp_res, fn), os.path.join(stp_dst, fn))
    # ngram package (NGram/EdgeNGram token filters) — CodepointCount +
    # CharacterUtils deps resolve via sourcepath
    ng_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/ngram/NGramTokenFilter.class"
    )
    if not os.path.exists(ng_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/ngram/NGramTokenFilter.java",
             f"{ac_root}/ngram/EdgeNGramTokenFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # pattern package (PatternTokenizer + PatternCaptureGroupTokenFilter)
    pt_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/pattern/PatternTokenizer.class"
    )
    if not os.path.exists(pt_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             "-sourcepath",
             "/root/reference/lucene/analysis/common/src/java",
             f"{ac_root}/pattern/PatternTokenizer.java",
             f"{ac_root}/pattern/PatternCaptureGroupTokenFilter.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # path hierarchy tokenizers
    ph_marker = os.path.join(
        CLASSES, "org/apache/lucene/analysis/path/PathHierarchyTokenizer.class"
    )
    if not os.path.exists(ph_marker) and os.path.isdir(ac_root):
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES,
             f"{ac_root}/path/PathHierarchyTokenizer.java",
             f"{ac_root}/path/ReversePathHierarchyTokenizer.java"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    # Solr's DateMathParser (solr/core/src/java/org/apache/solr/util/
    # DateMathParser.java) — the date-math surface is pure java.time, but
    # the class carries three solr-core imports (SolrException wrapping
    # and a SolrRequestInfo fallback for implicit now/tz). Compile a
    # patched copy that replaces the exception wrapper with
    # IllegalArgumentException and pins the fallback to UTC/current-time
    # (a build shim — every pinned entry point passes explicit now + tz,
    # so the patched lines are outside the verified surface).
    dm_marker = os.path.join(CLASSES, "org/apache/solr/util/DateMathParser.class")
    dm_src = "/root/reference/solr/core/src/java/org/apache/solr/util/DateMathParser.java"
    if not os.path.exists(dm_marker) and os.path.exists(dm_src):
        with open(dm_src) as f:
            dm_code = f.read()
        dm_code = dm_code.replace(
            "import org.apache.solr.common.SolrException;\n", ""
        ).replace(
            "import org.apache.solr.common.params.CommonParams;\n", ""
        ).replace(
            "import org.apache.solr.request.SolrRequestInfo;\n", ""
        ).replace(
            "new SolrException(SolrException.ErrorCode.BAD_REQUEST,",
            "new IllegalArgumentException(",
        ).replace(
            "SolrRequestInfo reqInfo = SolrRequestInfo.getRequestInfo();\n"
            "      tz = (null != reqInfo) ? reqInfo.getClientTimeZone() : DEFAULT_MATH_TZ;",
            "tz = DEFAULT_MATH_TZ;",
        ).replace(
            "SolrRequestInfo reqInfo = SolrRequestInfo.getRequestInfo();\n"
            "      if (reqInfo == null) {\n"
            "        // fall back to current time if no request info set\n"
            "        now = new Date();\n"
            "      } else {\n"
            "        now = reqInfo.getNOW(); // never null\n"
            "      }",
            "now = new Date();",
        )
        dm_tmp = os.path.join(BUILD, "DateMathParser.java")
        with open(dm_tmp, "w") as f:
            f.write(dm_code)
        r = subprocess.run(
            ["javac", "-nowarn", "-encoding", "UTF-8", "-cp", CLASSES,
             "-d", CLASSES, dm_tmp],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            return False
    os.makedirs(HARNESS_DIR, exist_ok=True)
    for name, code in (
        ("GroundTruth", HARNESS_JAVA),
        ("GroundTruthTopK", TOPK_JAVA),
        ("GroundTruthParser", PARSER_JAVA),
        ("GroundTruthSimple", SIMPLE_JAVA),
        ("GroundTruthXml", XML_JAVA),
        ("GroundTruthTokenize", TOKENIZE_JAVA),
        ("GroundTruthPayload", PAYLOAD_JAVA),
        ("GroundTruthMLT", MLT_JAVA),
        ("GroundTruthSpell", SPELL_JAVA),
        ("GroundTruthClassify", CLASSIFY_JAVA),
        ("GroundTruthGroup", GROUP_JAVA),
        ("GroundTruthGroup2", GROUP2_JAVA),
        ("GroundTruthFieldMask", FIELDMASK_JAVA),
        ("GroundTruthSlowFuzzy", SLOWFUZZY_JAVA),
        ("GroundTruthFLT", FLT_JAVA),
        ("GroundTruthGeoPoint", GEOPOINT_JAVA),
        ("GroundTruthCompletion", COMPLETION_JAVA),
        ("GroundTruthIdxSplit", IDXSPLIT_JAVA),
        ("GroundTruthStrDist", STRDIST_JAVA),
        ("GroundTruthGeo3D", GEO3D_JAVA),
        ("GroundTruthHighlight", HIGHLIGHT_JAVA),
        ("GroundTruthClassicHL", CLASSICHL_JAVA),
        ("GroundTruthFlexible", FLEXIBLE_JAVA),
        ("GroundTruthAnalyzingQP", ANALYZINGQP_JAVA),
        ("GroundTruthExplain", EXPLAIN_JAVA),
        ("GroundTruthMemory", MEMORY_JAVA),
        ("GroundTruthSpatial", SPATIAL_JAVA),
        ("GroundTruthJoin", JOIN_JAVA),
        ("GroundTruthPorter", PORTER_JAVA),
        ("GroundTruthFacet", FACET_JAVA),
        ("GroundTruthComplex", COMPLEX_JAVA),
        ("GroundTruthSurround", SURROUND_JAVA),
        ("GroundTruthDateMath", DATEMATH_JAVA),
        ("GroundTruthJoinUtil", JOINUTIL_JAVA),
        ("GroundTruthFacetAssoc", FACETASSOC_JAVA),
        ("GroundTruthFVH", FVH_JAVA),
        ("GroundTruthBlendedInfix", BLENDEDINFIX_JAVA),
        ("GroundTruthFreeText", FREETEXT_JAVA),
        ("GroundTruthSuggesters", SUGGESTERS_JAVA),
        ("GroundTruthBloom", BLOOM_JAVA),
        ("GroundTruthFold", FOLD_JAVA),
        ("GroundTruthMinStem", MINSTEM_JAVA),
        ("GroundTruthWDF", WDF_JAVA),
        ("GroundTruthSyn", SYN_JAVA),
        ("GroundTruthShingle", SHINGLE_JAVA),
        ("GroundTruthCompound", COMPOUND_JAVA),
        ("GroundTruthCommonGrams", COMMONGRAMS_JAVA),
        ("GroundTruthRevWild", REVWILD_JAVA),
        ("GroundTruthCJK", CJK_JAVA),
        ("GroundTruthCharFilter", CHARFILTER_JAVA),
        ("GroundTruthKwMisc", KWMISC_JAVA),
        ("GroundTruthNGram", NGRAM_JAVA),
        ("GroundTruthPattern", PATTERN_JAVA),
        ("GroundTruthPath", PATH_JAVA),
        ("GroundTruthMisc", MISC_JAVA),
        ("GroundTruthSnowball", SNOWBALL_JAVA),
        ("GroundTruthHtmlStrip", HTMLSTRIP_JAVA),
        ("GroundTruthClassicTok", CLASSICTOK_JAVA),
        ("GroundTruthAutoStop", AUTOSTOP_JAVA),
        ("GroundTruthQuality", QUALITY_JAVA),
        ("GroundTruthMultiField", MULTIFIELD_JAVA),
        ("GroundTruthPerceptron", PERCEPTRON_JAVA),
        ("GroundTruthConfusion", CONFUSION_JAVA),
        ("GroundTruthSplitter", SPLITTER_JAVA),
    ):
        cls = os.path.join(HARNESS_DIR, f"{name}.class")
        src = os.path.join(HARNESS_DIR, f"{name}.java")
        stale = True
        if os.path.exists(cls) and os.path.exists(src):
            with open(src) as f:
                stale = f.read() != code  # recompile when the harness changed
        if stale:
            with open(src, "w") as f:
                f.write(code)
            r = subprocess.run(
                ["javac", "-cp", f"{CLASSES}:{HARNESS_DIR}", "-d", HARNESS_DIR, src],
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


def run_topk(
    docs: list[str], queries: list[str], sim: str = "bm25"
) -> list[list[tuple[int, str]]]:
    """Index `docs` (whitespace analysis, one segment) and run each query
    spec ('TERM t' / 'OR ...' / 'AND ...' / 'MSM n ...' / 'PHRASE slop ...'
    / 'MPHRASE slop off:a,b ...' / 'NOT n ...' / 'DISMAX tie ...' /
    'SPANNEAR slop ord ...' / 'SPANFIRST end t') through the compiled
    reference's IndexSearcher under `sim` (bm25 / classic / lm_dirichlet /
    lm_jelinek_mercer / dfr_inl2 / ib_ll — set at index AND search time).
    Returns per query the top-10 [(docid, score_str)]."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthTopK", sim],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        hits = []
        for part in line.split(";"):
            d, score = part.split(":")
            hits.append((int(d), score))
        out.append(hits)
    return out


def run_parser(docs: list[str], query_strings: list[str]) -> list[list[tuple[int, str]]]:
    """Index `docs` and run each RAW query string through the compiled
    reference's classic QueryParser (QueryParser.jj grammar) + search.
    Returns per query the top-10 [(docid, score_str)]."""
    payload = [str(len(docs))] + list(docs) + [str(len(query_strings))] + list(query_strings)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthParser"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (int(p.split(":")[0]), p.split(":")[1]) for p in line.split(";")
        ])
    return out


def run_simpleqp(
    docs: list[str], cases: list[tuple[str, int, str]]
) -> list[list[tuple[int, str]]]:
    """Index `docs` and run each (default_op 'OR'|'AND', flags, raw query)
    through the compiled reference's SimpleQueryParser + search. Returns
    per case the top-10 [(docid, score_str)]."""
    lines = [f"{op}\t{flags}\t{q}" for op, flags, q in cases]
    payload = [str(len(docs))] + list(docs) + [str(len(cases))] + lines
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSimple"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (int(p.split(":")[0]), p.split(":")[1]) for p in line.split(";")
        ])
    return out


def run_tokenize(lines: list[str]) -> list[list[tuple[int, str]]]:
    """Run raw text lines through the compiled REAL StandardAnalyzer
    chain (StandardTokenizer + StandardFilter + LowerCaseFilter +
    StopFilter(33)). Per line: [(position, token)] with stop-gap
    positions from the PositionIncrementAttribute."""
    payload = [str(len(lines))] + list(lines)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthTokenize"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        encoding="utf-8", timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        if not line.strip():
            continue
        if line == "-":
            out.append([])
            continue
        toks = []
        for part in line.split(" "):
            p, _sep, t = part.partition("|")
            toks.append((int(p), t))
        out.append(toks)
    return out


def run_flexible(docs: list[str], queries: list[str]) -> list:
    """Top-10 (docid, Float.toString(score)) per query through the REAL
    StandardQueryParser (queryparser/flexible) + IndexSearcher over a
    whitespace index. A query the parser rejects returns the string
    'PARSE_ERROR:<exception>'."""
    payload = [str(len(docs))] + list(docs)
    payload.append(str(len(queries)))
    payload.extend(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFlexible"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("PARSE_ERROR:"):
            out.append(line)
            continue
        if line == "-":
            out.append([])
            continue
        hits = []
        for part in line.split(";"):
            d, _sep, sc = part.partition(":")
            hits.append((int(d), sc))
        out.append(hits)
    return out


def run_explain(docs: list[str], queries: list[str]) -> list[list[tuple]]:
    """IndexSearcher.explain trees from the compiled reference over a
    whitespace index. Each query line: '<docid> <SHAPE...>' (TERM / OR /
    AND / MSM / BOOST / NOT / MIX / PHRASE). Returns per query the
    PRE-ORDER serialization [(is_match, Float.toString(value),
    n_children)]."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthExplain"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        nodes = []
        for part in line.split(" "):
            m, v, nc = part.split(":")
            nodes.append((m == "M", v, int(nc)))
        out.append(nodes)
    return out


def run_analyzing_qp(docs: list[str], queries: list[str]) -> list:
    """Top-10 (docid, Float.toString(score)) per query through the REAL
    AnalyzingQueryParser (queryparser/analyzing) + IndexSearcher over a
    STANDARD-analyzer index (so the chunk analysis is observable).
    Rejected queries return 'PARSE_ERROR:<exception>'."""
    from urllib.parse import quote

    payload = [str(len(docs))] + [quote(d) for d in docs]
    payload.append(str(len(queries)))
    payload.extend(quote(q) for q in queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthAnalyzingQP"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        encoding="utf-8", timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("PARSE_ERROR:"):
            out.append(line)
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (int(d), sc) for d, _s, sc in
            (part.partition(":") for part in line.split(";"))
        ])
    return out


def run_classic_highlight(
    docs: list[str], queries: list[tuple[int, int, str]]
) -> list[list[list[tuple[str, str]]]]:
    """Run the REAL classic Highlighter (QueryScorer + SimpleFragmenter +
    SimpleHTMLFormatter) over every (query, doc) pair. `queries` entries
    are (fragment_size, max_num_fragments, classic_query_string) or
    (fragment_size, max_num_fragments, 'S'|'P', query) — 'P' uses
    SimpleSpanFragmenter(queryScorer) instead of SimpleFragmenter.
    Returns per query a list (per doc, in order) of
    [(fragment_string, Float.toString(score))]."""
    from urllib.parse import quote, unquote_plus

    payload = [str(len(docs))] + [quote(d) for d in docs]
    payload.append(str(len(queries)))
    for spec in queries:
        fs, mf, q = spec[0], spec[1], spec[-1]
        frag = spec[2] if len(spec) == 4 else "S"
        payload.append(f"HL {fs} {mf} {frag} {quote(q)}")
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthClassicHL"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        encoding="utf-8", timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    lines = [ln for ln in r.stdout.splitlines()]
    out = []
    idx = 0
    for _q in queries:
        per_doc = []
        for _d in docs:
            line = lines[idx]
            idx += 1
            if line == "-":
                per_doc.append([])
                continue
            frags = []
            for part in line.split(";"):
                enc, _sep, score = part.rpartition("|")
                frags.append((unquote_plus(enc), score))
            per_doc.append(frags)
        out.append(per_doc)
    return out


def run_xml(docs: list[str], xml_queries: list[str]) -> list:
    """Index `docs` and run each SINGLE-LINE XML query string through the
    compiled reference's CoreParser + search. Per query: the top-10
    [(docid, score_str)], or the string "!<ExceptionSimpleName>" when the
    reference parser threw."""
    payload = [str(len(docs))] + list(docs) + [str(len(xml_queries))] + list(xml_queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthXml"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
        elif line.startswith("!"):
            out.append(line)
        else:
            out.append([
                (int(p.split(":")[0]), p.split(":")[1]) for p in line.split(";")
            ])
    return out


def run_payload(docs: list[str], queries: list[str]) -> list[list[tuple[int, str]]]:
    """Index `docs` through the payload chain (whitespace +
    DelimitedPayloadTokenFilter(FloatEncoder) behavior: 'tok|1.5') with a
    BM25 similarity whose computePayloadFactor decodes the float payload,
    then run PAYSCORE / PAYCHECK query specs through the REAL
    PayloadScoreQuery / SpanPayloadCheckQuery. Top-10 [(docid, score)]."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthPayload"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (int(p.split(":")[0]), p.split(":")[1]) for p in line.split(";")
        ])
    return out


def run_mlt(docs: list[str], queries: list[str]) -> list[list[tuple[int, str]]]:
    """Index stored whitespace docs and run 'MLT <docid> <maxQueryTerms>
    <minTermFreq> <minDocFreq>' through the REAL MoreLikeThis (term
    selection by tf * classic idf with the min-freq filters) + BM25
    search. Top-10 [(docid, score)]."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthMLT"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (int(x.split(":")[0]), x.split(":")[1]) for x in line.split(";")
        ])
    return out


def run_spell(docs: list[str], queries: list[str]) -> list[str]:
    """Index whitespace docs and run 'DS word numSug maxEdits minPrefix
    accuracy minQueryLength maxQueryFrequency' through the REAL
    DirectSpellChecker, 'WBB word maxChanges minBreakLength
    maxEvaluations minSuggestionFrequency' through suggestWordBreaks, or
    'WBC maxChanges minSuggFreq maxEvaluations t1 t2..' through
    suggestWordCombinations. Returns the raw result line per query
    (DS: 'term:score:freq;...', WBB: 'w1:f1,w2:f2;...',
    WBC: 'combined:freq:i,j;...', '-' when empty)."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSpell"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_group(docs: list[str], queries: list[str]) -> list[str]:
    """Index docs given as '<group> <key> <body...>' (group = sorted
    doc-values, key = numeric doc-values) and run 'GROUP nGroups nWithin
    t1 t2..' through the REAL GroupingSearch (TermFirst/SecondPass
    collectors, relevance sorts) or 'DIV k maxPerKey t1 t2..' through
    DiversifiedTopDocsCollector keyed on 'key'. GROUP result lines:
    'grp|maxScore|doc:score,..;...' best group first; DIV:
    'doc:score;...'."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthGroup"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_group2(docs: list[str], queries: list[str]) -> list[str]:
    """Index docs given as '<group|_> <key> <facetCSV|_> <body...>' and run
    the rest of the grouping module (ALLGROUPS / HEADS / DISTINCT /
    GFACET sv|mv / BLOCK) plus the join module's global-ordinals path
    (GJOIN mode minOcc maxOcc|inf) against the compiled collectors.
    See GROUP2_JAVA for the per-command output grammar."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthGroup2"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_slow_fuzzy(docs: list[str], queries: list[str]) -> list[str]:
    """Index WS body docs and run 'SF <minSim> <prefixLen> <maxExp>
    <term>' through the compiled sandbox SlowFuzzyQuery. Output lines
    '<term:boost,...>|<doc:score;...>' (rewritten clauses + top-10)."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSlowFuzzy"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_geo3d(docs: list[str], queries: list[str]) -> list[str]:
    """Index 'lat lon' docs as Geo3DPoint (WGS84) and run
    'CIRCLE lat lon radiusMeters' distance queries; docids ASC."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthGeo3D"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_strdist(pairs: list[tuple[str, str]]) -> list[str]:
    """Run (s1, s2) pairs through the compiled spell StringDistance
    classes; one 'jw:ng2:ng3:lev:luc' line per pair."""
    payload = [f"{a}|{b}" for a, b in pairs]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthStrDist"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_idx_split(docs: list[str], queries: list[str]) -> list[str]:
    """Index '<pk> <body...>' docs and run PKIndexSplitter /
    MultiPassIndexSplitter via the compiled lucene/misc classes; per
    part: orig ids in docid order + top-10 of a body TermQuery."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthIdxSplit"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_completion(docs: list[str], queries: list[str]) -> list[str]:
    """Index '<surface> <weight> <ctxCSV|_>' docs as SuggestField (+
    ContextSuggestField) under the completion postings format and run
    CPREFIX/CREGEX/CFUZZY/CCTX through the compiled SuggestIndexSearcher.
    Output lines 'doc:surface:ctx:score;...'."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthCompletion"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_geopoint(docs: list[str], queries: list[str]) -> list[str]:
    """Index 'lat lon' docs as GeoPointField (PREFIX morton terms) and
    run ENC/DEC/BBOX commands against the compiled geopoint module."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthGeoPoint"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_fieldmask(docs: list[str], queries: list[str]) -> list[str]:
    """Index docs '<body tokens>|<alt tokens>' (two WS TextFields) and run
    MNEAR slop o|u <b:t|a:t>... / MFIRST end <b:t|a:t> where a: clauses
    wrap in FieldMaskingSpanQuery(..., 'body'). Output per query:
    'doc:score;...' top-10 (Float.toString)."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFieldMask"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_highlight(docs: list[str], queries: list[str]) -> list[dict[int, str]]:
    """Index StandardAnalyzer docs (stored + offsets) and run
    'HL <maxPassages> t1 t2..' through the REAL PostingsHighlighter over
    the query's full hit list. Returns per query {docid: snippet}."""
    from urllib.parse import quote, unquote_plus

    payload = (
        [str(len(docs))] + [quote(d) for d in docs]
        + [str(len(queries))] + list(queries)
    )
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthHighlight"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append({})
            continue
        m = {}
        for part in ln.split(";"):
            d, snip = part.split(":", 1)
            m[int(d)] = unquote_plus(snip)
        out.append(m)
    return out


def run_join(blocks: list[tuple[list[str], str]], queries: list[str]) -> list[str]:
    """Index parent/child BLOCKS via addDocuments (children first, parent
    last, type:p marker) and run 'TOPARENT <none|avg|max|total> t..'
    through ToParentBlockJoinQuery or 'TOCHILD _ t..' through
    ToChildBlockJoinQuery. Returns 'doc:score;...' per query."""
    payload = [str(len(blocks))]
    for children, parent in blocks:
        payload.append(str(len(children)))
        payload.extend(children)
        payload.append(parent)
    payload += [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthJoin"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_facet(docs: list[str], queries: list[str]) -> list[str]:
    """Index '<dimvalue> <body...>' docs (SortedSetDocValuesFacetField)
    and run 'FACET <topN> t1 t2..' through SortedSetDocValuesFacetCounts
    .getTopChildren over the OR query's FacetsCollector hits. Returns
    'label:count;...' per query in the reference's top-children order."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFacet"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_complex(
    docs: list[str], queries: list[str], in_order: bool = True
) -> list[list[tuple[int, str]]]:
    """Index docs and run raw query strings (URL-encoded on the wire)
    through the REAL ComplexPhraseQueryParser + search. in_order=False
    selects setInOrder(false) (a "U " wire prefix per query line).
    Returns per query the top-10 [(docid, score_str)]."""
    from urllib.parse import quote

    pre = "" if in_order else "U "
    payload = (
        [str(len(docs))] + list(docs)
        + [str(len(queries))] + [pre + quote(q) for q in queries]
    )
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthComplex"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (int(p.split(":")[0]), p.split(":")[1]) for p in line.split(";")
        ])
    return out


def run_freetext(
    docs: list[str], lookups: list[tuple[str, int]]
) -> list[list[tuple[str, int]]]:
    """Build the REAL FreeTextSuggester (grams=2, separator 0x1e,
    whitespace analysis) over docs and run each (key, num) lookup.
    Returns per lookup [(result key incl. separator bytes, long score)];
    a reference IllegalArgumentException (e.g. empty key) returns
    [("!err", 0)]."""
    from urllib.parse import quote, unquote

    payload = (
        [str(len(docs))] + list(docs)
        + [str(len(lookups))]
        + [f"{num} {quote(key)}" for key, num in lookups]
    )
    r = subprocess.run(
        # the suggester builds its temp index through FSDirectory →
        # MMapDirectory, whose unmap hack needs java.nio opened on 17+
        ["java", "--add-opens", "java.base/java.nio=ALL-UNNAMED",
         "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFreeText"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        if line == "!err":
            out.append([("!err", 0)])
            continue
        out.append([
            (unquote(p.rsplit(":", 1)[0]), int(p.rsplit(":", 1)[1]))
            for p in line.split(";")
        ])
    return out


def run_suggesters(
    entries: list[tuple[str, int]], queries: list[tuple[str, int, str]]
) -> list[list[tuple[str, int]]]:
    """Build the REAL completion lookups over weighted (key, weight)
    entries and run each (KIND, num, key) query. KIND: WFST / WFSTNX
    (WFSTCompletionLookup exactFirst on/off), FSTB (FSTCompletionLookup
    default lookup — alphabetical order, 10 buckets) / FSTBW (its
    onlyMorePopular weighted-order path), ANALYZING / ANALYZINGNX
    (AnalyzingSuggester exactFirst on/off, preserveSep), FUZZY
    (FuzzySuggester defaults). Returns per query
    [(result key, long value)]."""
    from urllib.parse import quote
    from urllib.parse import unquote_plus as unquote  # URLEncoder: ' '->'+'

    payload = (
        [str(len(entries))]
        + [f"{w} {quote(k)}" for k, w in entries]
        + [str(len(queries))]
        + [f"{kind} {num} {quote(key)}" for kind, num, key in queries]
    )
    r = subprocess.run(
        ["java", "--add-opens", "java.base/java.nio=ALL-UNNAMED",
         "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSuggesters"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (unquote(p.rsplit(":", 1)[0]), int(p.rsplit(":", 1)[1]))
            for p in line.split(";")
        ])
    return out


def run_surround(docs: list[str], queries: list[str]) -> list[list[tuple[int, str]]]:
    """Index docs and run raw surround-language strings through the REAL
    surround QueryParser + makeLuceneQueryField. Top-10 [(docid, score)]."""
    from urllib.parse import quote

    payload = (
        [str(len(docs))] + list(docs)
        + [str(len(queries))] + [quote(q) for q in queries]
    )
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSurround"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        if line.startswith("!"):
            out.append(line)  # "!PARSE" / "!TOOMANY" error-parity marker
            continue
        out.append([
            (int(p.split(":")[0]), p.split(":")[1]) for p in line.split(";")
        ])
    return out


def run_blended_infix(entries: list[tuple[str, int]],
                      queries: list[tuple[str, int, bool, str]]) -> list:
    """entries: (text, weight) in insertion order; queries: (blender
    'L'|'R'|'E', num, all_terms_required, key). Runs the REAL
    BlendedInfixSuggester. Per query: [(score_long_str, text)...]."""
    from urllib.parse import quote, unquote_plus

    payload = [str(len(entries))] + [f"{w}\t{quote(t)}" for t, w in entries]
    payload.append(str(len(queries)))
    payload += [
        f"{b} {num} {1 if req else 0} {quote(key)}"
        for b, num, req, key in queries
    ]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthBlendedInfix"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        pairs = []
        for part in line.split(";"):
            score, text = part.split(",", 1)
            pairs.append((score, unquote_plus(text)))
        out.append(pairs)
    return out


def run_fvh(docs: list[str], queries: list) -> list:
    """docs: body strings (whitespace tokens). queries:
    (doc_id, phrase_hl, frag_size, max_num, 'S'|'W',
     [("t", boost, term) | ("p", boost, slop, terms_list)]).
    Runs the REAL FastVectorHighlighter chain. Per query:
    [(Float.toString(totalBoost), fragment_string)...] or "!ERR"."""
    from urllib.parse import quote, unquote_plus

    payload = [str(len(docs))] + [quote(d) for d in docs]
    payload.append(str(len(queries)))
    for doc_id, phl, size, num, mode, clauses in queries:
        specs = []
        for c in clauses:
            if c[0] == "t":
                specs.append(f"t:{c[1]}:{c[2]}")
            else:
                specs.append(f"p:{c[1]}:{c[2]}:{' '.join(c[3])}")
        payload.append(
            f"{doc_id} {1 if phl else 0} {size} {num} {mode} "
            + quote("|".join(specs))
        )
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFVH"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        if line == "!ERR":
            out.append(line)
            continue
        frags = []
        for part in line.split(";"):
            score, frag = part.split(",", 1)
            # URLEncoder.encode writes '+' for spaces
            frags.append((score, unquote_plus(frag)))
        out.append(frags)
    return out


def run_facet_assoc(docs: list[tuple[str, list[tuple[str, str, str]]]],
                    queries: list[tuple[str, int]]) -> list:
    """docs: (match_flag 'm'/'x', [(dim, label, value_str)...] in field
    ADD order); queries: ("INT"|"FLOAT", topN). Runs the REAL
    TaxonomyFacetSum{Int,Float}Associations.getTopChildren. Returns per
    query ([(label, value_str)...], child_count) or None."""
    payload = [str(len(docs))]
    for flag, fields in docs:
        spec = ",".join(f"{d}/{lb}/{v}" for d, lb, v in fields)
        payload.append(f"{flag}\t{spec}")
    payload.append(str(len(queries)))
    payload += [f"{kind} {topn}" for kind, topn in queries]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFacetAssoc"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append(None)
            continue
        lv, child_count = line.rsplit("|", 1)
        pairs = []
        if lv:
            for p in lv.split(";"):
                lb, v = p.split(":")
                pairs.append((lb, v))
        out.append((pairs, int(child_count)))
    return out


def run_joinutil(from_docs: list[tuple[str, str]], to_keys: list[str],
                 queries: list[tuple[str, list[str]]]) -> list[list[tuple[int, str]]]:
    """from_docs: (join key, body); to_keys: one join key per to doc
    (ids continue after the from docs); queries: (score_mode, terms).
    Runs the REAL JoinUtil.createJoinQuery. Top-10 [(docid, score)]."""
    payload = [str(len(from_docs))]
    payload += [f"{k}\t{b}" for k, b in from_docs]
    payload.append(str(len(to_keys)))
    payload += list(to_keys)
    payload.append(str(len(queries)))
    payload += [f"{m} {' '.join(ts)}" for m, ts in queries]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthJoinUtil"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line == "-":
            out.append([])
            continue
        out.append([
            (int(p.split(":")[0]), p.split(":")[1]) for p in line.split(";")
        ])
    return out


def run_datemath(cases: list[tuple[str, str, int, str]]) -> list[str]:
    """cases: (mode, tz, now_ms, val). mode "S" = the static
    parseMath(Date, String) full-string form (default UTC zone); "I" =
    DateMathParser(tz).setNow(now).parseMath(math). Returns epoch-millis
    strings, or "!PARSE"/"!ERR" markers."""
    from urllib.parse import quote

    payload = [str(len(cases))] + [
        f"{m};{tz};{now};{quote(val)}" for m, tz, now, val in cases
    ]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthDateMath"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_porter(lines: list[str]) -> list[str]:
    """Run whitespace-token lines through the REAL PorterStemFilter
    (analysis/common en); returns the stemmed line per input line."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthPorter"],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.rstrip("\n") for ln in r.stdout.splitlines()]


def run_memory(cases: list[str]) -> list[str]:
    """Run '<spec>#<doc text>' cases (TERM/OR/AND/PHRASE spec shapes)
    through the REAL MemoryIndex.search — one single-doc RAM index per
    case. Returns Float.toString(score) per case ('0.0' = no match)."""
    payload = [str(len(cases))] + list(cases)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthMemory"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_spatial(points: list[tuple[float, float]], queries: list[str]) -> list[str]:
    """Index (lat, lon) points as LatLonPoint + LatLonDocValuesField and
    run 'DIST lat lon radiusMeters k' through LatLonPoint.newDistanceQuery
    + LatLonDocValuesField.newDistanceSort. Returns 'doc:meters;...' per
    query in sort order (SloppyMath distances)."""
    payload = (
        [str(len(points))]
        + [f"{la!r} {lo!r}" for la, lo in points]
        + [str(len(queries))] + list(queries)
    )
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSpatial"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_classify(docs: list[str], queries: list[str]) -> list[str]:
    """Index docs given as '<class> <body tokens...>' (class = StringField
    'cls', body = whitespace TextField) and run 'NB <text>' through the
    REAL SimpleNaiveBayesClassifier.assignClass or 'KNN k minDocFreq
    minTermFreq # <text>' through KNearestNeighborClassifier.assignClass.
    Returns '<class>:<Double.toString(normalized score)>' per query."""
    payload = [str(len(docs))] + list(docs) + [str(len(queries))] + list(queries)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthClassify"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]


def run_bloom(
    max_doc: int,
    desired_sat: float,
    target_sat: float,
    added: list[bytes],
    queries: list[bytes],
) -> dict:
    """Build a FuzzySet via createSetBasedOnQuality(max_doc, desired_sat),
    add `added`, probe `queries`, then downsize(target_sat). Returns the
    compiled reference's saturation (Float.toString), estimated unique
    values, serialized bytes, per-query MAYBE bits, and the downsized
    set's bytes + bits (None when downsize returned null)."""
    payload = (
        [f"{max_doc} {desired_sat!r} {target_sat!r}", str(len(added))]
        + [v.hex() for v in added]
        + [str(len(queries))]
        + [v.hex() for v in queries]
    )
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthBloom"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out: dict = {}
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        key, _, val = ln.partition(" ")
        if key in ("orig", "down"):
            out[key] = None if val == "null" else bytes.fromhex(val)
        elif key in ("contains", "downcontains"):
            out[key] = None if val == "-" else val
        elif key == "sat":
            out[key] = val
        elif key == "est":
            out[key] = int(val)
    return out


def run_fold(tokens: list[str]) -> list[str]:
    """Run each token through the compiled ASCIIFoldingFilter.foldToASCII
    (UTF-16BE hex wire format so any BMP/astral content survives)."""
    payload = [t.encode("utf-16-be").hex() for t in tokens]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFold"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [
        bytes.fromhex(ln.strip()).decode("utf-16-be")
        for ln in r.stdout.splitlines()
    ]


def run_wdf(
    lines: list[str], flags: int, prot: list[str] | None = None
) -> list[list[tuple[str, int, int, int]]]:
    """Run each line through WhitespaceTokenizer + the compiled
    WordDelimiterFilter(flags, prot). Returns per line the emitted
    (term, posInc, startOffset, endOffset) stream."""
    # the compile marker predates WDF: force a rebuild of the analysis
    # block if the class is missing
    if not os.path.exists(os.path.join(
        CLASSES, "org/apache/lucene/analysis/miscellaneous/WordDelimiterFilter.class"
    )):
        build()
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthWDF",
         str(flags), ",".join(prot) if prot else "-"],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, s, e, hx = part.split(":")
            toks.append(
                (bytes.fromhex(hx).decode("utf-16-be"), int(pi), int(s), int(e))
            )
        out.append(toks)
    return out


def run_syn(
    rules: list[tuple[str, str, bool]], lines: list[str], ignore_case: bool = False,
    solr_rules: list[str] | None = None, expand: bool = True,
    wordnet_rules: list[str] | None = None,
) -> list[list[tuple]]:
    """Build a SynonymMap from (input phrase, output phrase, includeOrig)
    rules (words space-separated) and run each line through the compiled
    WhitespaceTokenizer + SynonymFilter. Returns per line the emitted
    (term, posInc, posLen, startOffset, endOffset, type) stream."""
    if solr_rules is not None:
        payload = [str(len(solr_rules))] + list(solr_rules) + list(lines)
        mode = [f"solr:{'1' if expand else '0'}"]
    elif wordnet_rules is not None:
        payload = [str(len(wordnet_rules))] + list(wordnet_rules) + list(lines)
        mode = [f"wordnet:{'1' if expand else '0'}"]
    else:
        payload = [str(len(rules))] + [
            f"{i}|{o}|{'1' if keep else '0'}" for i, o, keep in rules
        ] + list(lines)
        mode = []
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSyn",
         "1" if ignore_case else "0"] + mode,
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, pl, s, e, typ, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi),
                         int(pl), int(s), int(e), typ))
        out.append(toks)
    return out


def run_shingle(
    lines: list[str], min_n: int, max_n: int, unigrams: bool,
    unigrams_if_no_shingles: bool = False, use_stop: bool = False,
    sep: str = " ",
) -> list[list[tuple]]:
    """Run each line through the compiled WhitespaceTokenizer
    [+ StopFilter(33)] + ShingleFilter(min,max) with the given knobs.
    Returns per line (term, posInc, posLen, startOffset, endOffset,
    type) streams."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthShingle",
         str(min_n), str(max_n), "1" if unigrams else "0",
         "1" if unigrams_if_no_shingles else "0",
         "1" if use_stop else "0", sep],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, pl, s, e, typ, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi),
                         int(pl), int(s), int(e), typ))
        out.append(toks)
    return out


def run_compound(
    dictionary: list[str], lines: list[str], min_word: int = 5,
    min_sub: int = 2, max_sub: int = 15, only_longest: bool = False,
) -> list[list[tuple]]:
    """Run lines through the compiled WhitespaceTokenizer +
    DictionaryCompoundWordTokenFilter. Returns per line
    (term, posInc, startOffset, endOffset) streams."""
    payload = [str(len(dictionary))] + list(dictionary) + list(lines)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthCompound",
         str(min_word), str(min_sub), str(max_sub),
         "1" if only_longest else "0"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, st, e, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi),
                         int(st), int(e)))
        out.append(toks)
    return out


def run_commongrams(
    common_words: list[str], lines: list[str], query: bool = False,
    use_stop: bool = False,
) -> list[list[tuple]]:
    """Run each line through the compiled WhitespaceTokenizer
    [+ StopFilter(33)] + CommonGramsFilter(common_words)
    [+ CommonGramsQueryFilter when query=True]. Returns per line
    (term, posInc, posLen, startOffset, endOffset, type) streams."""
    payload = [str(len(common_words))] + list(common_words) + list(lines)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthCommonGrams",
         "query" if query else "index", "1" if use_stop else "0"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, pl, s, e, typ, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi),
                         int(pl), int(s), int(e), typ))
        out.append(toks)
    return out


def _parse_revwild_lines(stdout: str) -> list[list[tuple]]:
    out = []
    for ln in stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, s, e, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi),
                         int(s), int(e)))
        out.append(toks)
    return out


def run_revwild_stream(
    lines: list[str], with_original: bool = True,
) -> list[list[tuple]]:
    """WhitespaceTokenizer + ReversedWildcardFilter (via the real
    factory, marker \\u0001) per line -> (term, posInc, start, end)."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthRevWild",
         "stream", "1" if with_original else "0"],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return _parse_revwild_lines(r.stdout)


def run_reverse_filter(lines: list[str], with_marker: bool) -> list[list[tuple]]:
    """WhitespaceTokenizer + ReverseStringFilter [marker \\u0001]."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthRevWild",
         "reverse", "0", "1" if with_marker else "0"],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return _parse_revwild_lines(r.stdout)


def run_should_reverse(
    tokens: list[str], max_pos_asterisk: int = 2, max_pos_question: int = 1,
    min_trailing: int = 2, max_fraction_asterisk: float = 0.0,
) -> list[bool]:
    """ReversedWildcardFilterFactory.shouldReverse per token."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthRevWild",
         "should", "true", str(max_pos_asterisk), str(max_pos_question),
         str(min_trailing), repr(float(max_fraction_asterisk))],
        input="\n".join(tokens) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return [x.strip() == "1" for x in r.stdout.splitlines() if x.strip()]


def run_cjk(
    lines: list[str], mode: str = "bigram", flags: int = 15,
    output_unigrams: bool = False,
) -> list[list[tuple]]:
    """mode='width': WhitespaceTokenizer + CJKWidthFilter;
    mode='bigram': StandardTokenizer + CJKBigramFilter(flags,
    outputUnigrams); mode='types': bare StandardTokenizer (for the
    TypeAttribute). Returns per line (term, posInc, posLen, start, end,
    type) streams."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthCJK",
         mode, str(flags), "1" if output_unigrams else "0"],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, pl, s, e, typ, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi),
                         int(pl), int(s), int(e), typ))
        out.append(toks)
    return out


def _hex16(s: str) -> str:
    return s.encode("utf-16-be").hex()


def run_charfilter(
    lines: list[str], mode: str = "mapping",
    rules: dict | None = None, pattern: str = "", replacement: str = "",
) -> list[tuple[str, list[int]]]:
    """mode='mapping': MappingCharFilter(rules); mode='patrep':
    PatternReplaceCharFilter(pattern, replacement). Returns per line
    (filtered text, [correctOffset(i) for i in 0..len])."""
    payload: list[str] = []
    if mode == "mapping":
        payload.append(str(len(rules)))
        for k, v in rules.items():
            payload.append(f"{_hex16(k)}\t{_hex16(v)}")
    else:
        payload.append(_hex16(pattern))
        payload.append(_hex16(replacement))
    payload += [_hex16(ln) for ln in lines]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthCharFilter", mode],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        hx, offs = ln.split("|")
        out.append((
            bytes.fromhex(hx).decode("utf-16-be") if hx else "",
            [int(x) for x in offs.split(",")],
        ))
    return out


def run_kwmisc(
    lines: list[str], mode: str = "repeat", protected: list[str] | None = None,
) -> list[list[tuple]]:
    """mode='repeat': Whitespace + LowerCase + KeywordRepeatFilter
    [+ SetKeywordMarkerFilter(protected)] + PorterStemFilter +
    RemoveDuplicatesTokenFilter; mode='marker': Whitespace + LowerCase +
    SetKeywordMarkerFilter(protected) + PorterStemFilter. Returns per
    line (term, posInc) streams."""
    protected = protected or []
    payload = [str(len(protected))] + list(protected) + list(lines)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthKwMisc", mode],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi)))
        out.append(toks)
    return out


def run_ngram(
    lines: list[str], mode: str, min_gram: int, max_gram: int,
) -> list[list[tuple]]:
    """WhitespaceTokenizer + NGramTokenFilter (mode='ngram') or
    EdgeNGramTokenFilter (mode='edge'). Returns per line
    (term, posInc, posLen, start, end) streams."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthNGram",
         mode, str(min_gram), str(max_gram)],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, pl, s, e, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi),
                         int(pl), int(s), int(e)))
        out.append(toks)
    return out


def run_pattern_tok(
    lines: list[str], pattern: str, group: int,
) -> list[list[tuple]]:
    """PatternTokenizer(pattern, group) per line ->
    (term, posInc, start, end) streams."""
    payload = [_hex16(pattern)] + [_hex16(ln) for ln in lines]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthPattern",
         "tok", str(group)],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return _parse_revwild_lines(r.stdout)


def run_pattern_capture(
    lines: list[str], patterns: list[str], preserve: bool,
) -> list[list[tuple]]:
    """WhitespaceTokenizer + PatternCaptureGroupTokenFilter(preserve,
    patterns) per line -> (term, posInc, start, end) streams."""
    payload = ([str(len(patterns))] + [_hex16(p) for p in patterns]
               + [_hex16(ln) for ln in lines])
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthPattern",
         "capture", "1" if preserve else "0"],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return _parse_revwild_lines(r.stdout)


def run_path(
    lines: list[str], reverse: bool = False, delimiter: str = "/",
    replacement: str = "/", skip: int = 0,
) -> list[list[tuple]]:
    """PathHierarchyTokenizer / ReversePathHierarchyTokenizer per line
    -> (term, posInc, start, end) streams."""
    payload = [_hex16(ln) for ln in lines]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthPath",
         "reverse" if reverse else "forward", delimiter, replacement, str(skip)],
        input="\n".join(payload) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return _parse_revwild_lines(r.stdout)


def run_misc(
    lines: list[str], mode: str, *args: object,
    words: list[str] | None = None, prefixes: list[str] | None = None,
) -> list[list[tuple]]:
    """GT round 55 — miscellaneous filter pack. `mode` selects the chain
    (see GroundTruthMisc); inputs/word sets ride hex16. Returns per line
    (term, posInc, start, end) streams."""
    payload: list[str] = []
    if mode in ("truncate", "keep", "cap"):
        ws = words or []
        payload.append(str(len(ws)))
        payload.extend(_hex16(w) for w in ws)
        if mode == "cap":
            ps = prefixes or []
            payload.append(str(len(ps)))
            payload.extend(_hex16(p) for p in ps)
    payload.extend(_hex16(ln) for ln in lines)
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthMisc",
         mode, *[str(a) for a in args]],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return _parse_revwild_lines(r.stdout)


def run_htmlstrip(
    lines: list[str], escaped_tags: list[str] | None = None,
) -> list[tuple[str, list[int]]]:
    """GT round 57 — HTMLStripCharFilter over each line. Returns per
    line (stripped text, correctOffset for every output offset 0..len)."""
    esc = ",".join(_hex16(t) for t in (escaped_tags or []))
    payload = [_hex16(ln) for ln in lines]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthHtmlStrip", esc],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        hx, offs = ln.split("|")
        text = bytes.fromhex(hx).decode("utf-16-be") if hx else ""
        out.append((text, [int(x) for x in offs.split(",")]))
    return out


def run_classic_tok(
    lines: list[str], filter_: bool = True, max_len: int = 255,
) -> list[list[tuple]]:
    """GT round 58 — ClassicTokenizer [+ ClassicFilter]. Returns per line
    (term, type, posInc, start, end) streams."""
    payload = [_hex16(ln) for ln in lines]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthClassicTok",
         "1" if filter_ else "0", str(max_len)],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, s, e, th, hx = part.split(":")
            toks.append((
                bytes.fromhex(hx).decode("utf-16-be"),
                bytes.fromhex(th).decode("utf-16-be"),
                int(pi), int(s), int(e),
            ))
        out.append(toks)
    return out


def run_splitter(
    docs: list[tuple[str, str]], test_ratio: float, cv_ratio: float,
) -> tuple[list[str], list[str], list[str]]:
    """GT round 64 — DatasetSplitter over (class, text) docs. Returns
    (train, test, cv) body lists in each output index's doc order."""
    payload = [str(len(docs))]
    payload += [_hex16(f"{c}\t{t}") for c, t in docs]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSplitter",
         str(test_ratio), str(cv_ratio)],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        out.append(
            [] if ln == "-" else
            [bytes.fromhex(h).decode("utf-16-be") for h in ln.split(";")]
        )
    return out[0], out[1], out[2]


def run_confusion(docs: list[tuple[str, str]]) -> dict:
    """GT round 63 — ConfusionMatrixGenerator evaluating the compiled
    SimpleNaiveBayes over its own training docs. Returns {counts:
    {correct: {classified: n}}, accuracy, precision, recall, f1,
    per_class: {k: (p, r, f1)}}."""
    payload = [str(len(docs))]
    payload += [_hex16(f"{c}\t{t}") for c, t in docs]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthConfusion"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    parts = r.stdout.strip().split("|")
    counts: dict = {}
    for cell in parts[0].split(";"):
        if not cell:
            continue
        correct, classified, n = cell.split(":")
        counts.setdefault(correct, {})[classified] = int(n)
    per_class = {}
    for kp in parts[5:]:
        k, p, rr, f1 = kp.split(",")
        per_class[k] = (float(p), float(rr), float(f1))
    return {
        "counts": counts, "accuracy": float(parts[1]),
        "precision": float(parts[2]), "recall": float(parts[3]),
        "f1": float(parts[4]), "per_class": per_class,
    }


def run_perceptron(
    docs: list[tuple[bool, str]],
    probes: list[str],
    batch_size: int = 1,
    threshold: float | None = None,
) -> list[tuple[bool, float]]:
    """GT round 62 — BooleanPerceptronClassifier trained over
    (class, text) docs; returns per probe (assignedClass, score)."""
    payload = [str(len(docs))]
    payload += [_hex16(f"{'true' if c else 'false'}\t{t}") for c, t in docs]
    payload += [_hex16(p) for p in probes]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthPerceptron",
         str(batch_size), "-" if threshold is None else str(threshold)],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        cls, score = ln.split(";")
        out.append((cls == "true", float(score)))
    return out


def run_multifield(
    docs: list[tuple[str, str]],
    queries: list[str],
    boosts: tuple[float, float] | None = None,
    k: int = 10,
    dismax_tie: float | None = None,
    msm: int = 0,
) -> list[list[tuple[int, str]]]:
    """GT round 61 — MultiFieldQueryParser over (title, body) docs; with
    dismax_tie set, the Solr DisMax main-query shape (per-term
    DisjunctionMaxQuery over boosted per-field TermQueries + msm).
    Returns per query [(docid, Float.toString(score))...]."""
    payload = [str(len(docs))]
    payload += [_hex16(f"{t}\t{b}") for t, b in docs]
    payload += [_hex16(q) for q in queries]
    args = ["-", "-"] if boosts is None else [str(boosts[0]), str(boosts[1])]
    if dismax_tie is not None:
        args += [str(dismax_tie), str(msm)]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthMultiField",
         str(k), *args],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln == "-":
            out.append([])
            continue
        hits = []
        for part in ln.split(";"):
            doc, score = part.split(":")
            hits.append((int(doc), score))
        out.append(hits)
    return out


def run_quality(
    docs: list[tuple[str, str]],
    queries: list[tuple[str, str]],
    qrel_lines: list[str],
    max_results: int = 20,
) -> list[dict]:
    """GT round 60 — QualityBenchmark over (docName, text) docs and
    (qid, querytext) classic-parser queries judged by TREC qrels.
    Returns one dict per query plus the AVERAGE row last: recall, avp,
    mrr, num_points, num_good, max_good, p_at[1..20] (None where the
    reference throws)."""
    payload = [str(len(docs))]
    payload += [_hex16(f"{n}\t{t}") for n, t in docs]
    payload.append(str(len(queries)))
    payload += [_hex16(f"{q}\t{t}") for q, t in queries]
    payload.append(str(len(qrel_lines)))
    payload += [_hex16(ln) for ln in qrel_lines]
    r = subprocess.run(
        ["java", "-ea", "-cp", f"{CLASSES}:{HARNESS_DIR}",
         "GroundTruthQuality", str(max_results)],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        vals = [float(x) for x in ln.split(";")]
        out.append({
            "recall": vals[0], "avp": vals[1], "mrr": vals[2],
            "num_points": vals[3], "num_good": vals[4], "max_good": vals[5],
            "p_at": [None if v == -1 else v for v in vals[6:26]],
        })
    return out


def run_autostop(
    docs: list[str], queries: list[str], mode: str = "percent",
    value: float = 0.4,
) -> tuple[list[str], list[list[tuple]]]:
    """GT round 59 — QueryAutoStopWordAnalyzer over a whitespace+lower
    index of `docs`. Returns (sorted stop words, per-query (term,
    posInc) streams)."""
    payload = [_hex16(d) for d in docs] + [_hex16(q) for q in queries]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthAutoStop",
         mode, str(value), str(len(docs))],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    lines = [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]
    sw = [] if lines[0] == "-" else [
        bytes.fromhex(h).decode("utf-16-be") for h in lines[0].split(",")
    ]
    out = []
    for ln in lines[1:]:
        if ln == "-":
            out.append([])
            continue
        toks = []
        for part in ln.split(";"):
            pi, hx = part.split(":")
            toks.append((bytes.fromhex(hx).decode("utf-16-be"), int(pi)))
        out.append(toks)
    return sw, out


def run_snowball(lines: list[str], lang: str = "English") -> list[list[tuple]]:
    """GT round 56 — Whitespace + LowerCase + SnowballFilter(lang).
    Returns per line (term, posInc, start, end) streams."""
    payload = [_hex16(ln) for ln in lines]
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthSnowball", lang],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return _parse_revwild_lines(r.stdout)


def run_flt(docs: list[str], cases: list[tuple]) -> list[tuple]:
    """GT round 29c — FuzzyLikeThisQuery. cases =
    [(max_num_terms, ignore_tf, min_sim, prefix_len, text)]. Returns per
    case (groups, hits): groups = [[(term, boost_str), ...]] in the
    rewritten clause order, hits = [(docid, score_str)] top-10."""
    lines = [
        f"{mnt};{'true' if itf else 'false'};{ms};{pl};{text}"
        for mnt, itf, ms, pl, text in cases
    ]
    payload = [str(len(docs))] + list(docs) + [str(len(lines))] + lines
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthFLT"],
        input="\n".join(payload) + "\n", capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = []
    for line in r.stdout.splitlines():
        cl, _sep, hits = line.strip().partition("|")
        groups = []
        if cl != "-":
            for grp in cl.split("/"):
                inner = grp[1:-1].split(",") if grp.startswith("[") else [grp]
                groups.append([
                    (m.rsplit("^", 1)[0], m.rsplit("^", 1)[1])
                    for m in inner
                ])
        hl = []
        if hits != "-":
            for h in hits.split(";"):
                d, _s, sc = h.partition(":")
                hl.append((int(d), sc))
        out.append((groups, hl))
    return out


def run_minstem(tokens: list[str]) -> list[str]:
    """Run each token (one per line, no newlines inside) through the
    compiled EnglishMinimalStemmer.stem."""
    r = subprocess.run(
        ["java", "-cp", f"{CLASSES}:{HARNESS_DIR}", "GroundTruthMinStem"],
        input="\n".join(tokens) + "\n", capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return r.stdout.splitlines()


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
