package graft.sql

/** Typed AST for the reference dialect (grammar per
  * /root/reference/parser.go:1-29, surveyed in SURVEY.md §2) — Scala
  * case classes instead of the reference's untyped 5-slot Node tree.
  */
object Ast {

  // ── expressions ─────────────────────────────────────────────────────
  sealed trait Expr

  /** Literal as scanned; the analyzer types it (number / string / date /
    * duration) from context per the §2.10 literal-dimension rules. */
  final case class Lit(raw: String, quoted: Boolean) extends Expr
  final case class NullLit() extends Expr

  /** Column reference: bare name, cN positional, bare int positional
    * (with `c` option), or alias.name. */
  final case class ColRef(qualifier: Option[String], name: String) extends Expr

  sealed trait ArithOp
  case object Add extends ArithOp; case object Sub extends ArithOp
  case object Mul extends ArithOp; case object Div extends ArithOp
  case object Mod extends ArithOp; case object Pow extends ArithOp

  final case class Arith(op: ArithOp, l: Expr, r: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr

  /** Scalar function call (year, month, abs, coalesce, encrypt, ...). */
  final case class FnCall(name: String, args: Seq[Expr]) extends Expr

  /** Aggregate call (sum avg min max count stdev stdevp). */
  final case class AggCall(name: String, arg: Expr, distinct: Boolean) extends Expr

  /** `case when <preds> then e ... [else e] end`. */
  final case class CaseSearched(branches: Seq[(Pred, Expr)], els: Option[Expr]) extends Expr
  /** `case <subj> when v then e ... [else e] end`. */
  final case class CaseSimple(subject: Expr, branches: Seq[(Expr, Expr)], els: Option[Expr]) extends Expr

  // ── predicates ──────────────────────────────────────────────────────
  sealed trait Pred
  sealed trait CmpOp
  case object Eq extends CmpOp; case object Ne extends CmpOp
  case object Lt extends CmpOp; case object Le extends CmpOp
  case object Gt extends CmpOp; case object Ge extends CmpOp

  final case class Cmp(op: CmpOp, l: Expr, r: Expr) extends Pred
  /** Dialect LIKE: case-insensitive anchored (%→.*, _→.). */
  final case class LikeP(e: Expr, pattern: String, negated: Boolean) extends Pred
  final case class InP(e: Expr, list: Seq[Expr], negated: Boolean) extends Pred
  /** Symmetric half-open between (reference selector.go:480-495). */
  final case class BetweenP(e: Expr, a: Expr, b: Expr, negated: Boolean) extends Pred
  final case class AndP(l: Pred, r: Pred) extends Pred
  final case class OrP(l: Pred, r: Pred) extends Pred
  final case class XorP(l: Pred, r: Pred) extends Pred
  final case class NotP(p: Pred) extends Pred

  // ── statements ──────────────────────────────────────────────────────
  /** One dialect statement: a `select` query or a pipeline statement
    * (beyond-reference surface, SURVEY §2.11 spirit). */
  sealed trait Stmt

  /** `dedup near|exact|best <idCol>[,] <textCol> from <table>
    * [threshold <t>]` — the MinHash-LSH dedup pipeline on the SQL
    * surface. `near` lowers to the d02/d03 builders (signature →
    * banded LSH candidate pairs, BucketGuard-bounded); with a
    * `threshold` it continues into d04's verification stage (exact
    * n-gram Jaccard on the candidates only) and keeps pairs with
    * jac ≥ t. `exact` lowers to the d01 hash-groupBy. `best` lowers
    * to the d19 canonical pick (CC clusters over the LSH pairs, keep
    * the highest-quality doc per cluster). Threshold is near-only.
    * Single table only (the FROM reuses the select grammar's table
    * resolution: registered name, basename, path, nh). */
  final case class DedupStmt(mode: String, idCol: String, textCol: String,
      from: FromClause, threshold: Option[Double] = None) extends Stmt {
    def near: Boolean = mode == "near"
  }

  /** `mix <idCol>[,] <textCol> from <table> [budget <n>] [per <srcCol>]`
    * — p12's token-budget mixture sampling on the SQL surface: each
    * `srcCol` group (default `source`) contributes docs in
    * DETERMINISTIC id-hash order until its token budget (default 800
    * whitespace tokens) is spent; a doc is admitted iff the budget is
    * not yet exhausted when it starts. Never RNG; a larger budget
    * admits a superset. Emits (source, id, n_tok, cum_tok, keep). */
  final case class MixStmt(idCol: String, textCol: String,
      from: FromClause, budget: Long = 800L,
      srcCol: String = "source") extends Stmt

  /** `similar <idCol>[,] <vecCol> from <table> [top <k>]` — whole-
    * corpus approximate-nearest-neighbor top-k on the SQL surface,
    * lowering to the v03 builder (banded random-hyperplane LSH
    * candidates, BucketGuard-bounded, cosine verification on the
    * candidates only — never n²). Emits (q_id, n_id, sim, rank),
    * rank ≤ k (default 5). */
  final case class SimilarStmt(idCol: String, vecCol: String,
      from: FromClause, k: Long = 5L) extends Stmt

  /** `shard <idCol> from <table> [into <n>]` — the t32 training-shard
    * addressing on the SQL surface: every row gets a deterministic
    * (shard, pos) address (multiplicative-hash shard, md5-order
    * position within shard; one hash exchange, no global sort).
    * Default 16 shards. */
  final case class ShardStmt(idCol: String, from: FromClause,
      n: Long = 16L) extends Stmt

  /** `interleave <idCol>[,] <srcCol> from <table>` — the t33
    * deterministic round-robin source interleave on the SQL surface:
    * emits (doc_id, source, pos, rank) with rank the strict global
    * mixing order, computed without a global sort. */
  final case class InterleaveStmt(idCol: String, srcCol: String,
      from: FromClause) extends Stmt

  /** `search <idCol>[,] <textCol> from <table> for '<terms>'
    * [top <k>]` — BM25 keyword retrieval on the SQL surface, lowering
    * to the t21 builder (one tokenize pass → per-doc agg shared by
    * corpus stats and postings via ReusedExchange, global top-k).
    * Terms are the whitespace-split words of the quoted string,
    * lowercased; emits (doc_id, n_terms, bm25), k rows (default 20). */
  final case class SearchStmt(idCol: String, textCol: String,
      from: FromClause, terms: Seq[String], k: Long = 20L) extends Stmt

  /** `split <idCol> from <table> [into <p1> <p2> <p3>]` — the t06
    * reproducible train/val/test assignment on the SQL surface:
    * deterministic hash buckets (never RNG), percentages must be
    * positive integers summing to 100 (default 80 10 10). Emits
    * (doc_id, split). */
  final case class SplitStmt(idCol: String, from: FromClause,
      pcts: Seq[Long] = Seq(80L, 10L, 10L)) extends Stmt

  /** `cluster <idCol>[,] <vecCol> from <table> [into <k>]` — the v06
    * deterministic Lloyd k-means on the SQL surface: fit on the
    * corpus (centers collected as k·d doubles, re-broadcast as
    * literals each round — the corpus is never shuffled by center),
    * then one narrow assignment pass. Emits (vec_id, cell), k cells
    * (default 4). */
  final case class ClusterStmt(idCol: String, vecCol: String,
      from: FromClause, k: Long = 4L) extends Stmt

  /** `sample <idCol> from <table> [pct <n> | top <n> by <w> [per <g>]]`
    * — reproducible sampling on the SQL surface, never RNG (the same
    * rows are selected on any cluster size or run, so downstream
    * joins and reruns are stable). The pct form is t05's hash-bucket
    * filter (integer 1-99, default 10; emits the id column only).
    * `top <n> by <w>` is the x10 deterministic weighted draw (emits
    * id, weight, wkey); with `per <g>` it is the x13 stratified
    * per-group form (adds the group column and rank). */
  final case class SampleStmt(idCol: String, from: FromClause,
      pct: Long = 10L, topN: Option[Long] = None,
      weightCol: Option[String] = None,
      perCol: Option[String] = None) extends Stmt

  /** `card <idCol>[,] <textCol> from <table>` — the one-row dataset
    * datasheet on the SQL surface (p11's text-only core): doc count,
    * whitespace-token count, exact-duplicate doc count (md5), and
    * Det-mean quality. Three bounded aggregates; two corpus scans. */
  final case class CardStmt(idCol: String, textCol: String,
      from: FromClause) extends Stmt

  /** `calibrate <idCol>[,] <srcCol>[,] <textCol> from <table>` —
    * per-source quality percentiles on the SQL surface (t42): each
    * doc's quality percentile WITHIN ITS SOURCE plus a keep-top-70%
    * flag, via the histogram-CDF-broadcast shape (zero corpus-sized
    * windows). */
  final case class CalibrateStmt(idCol: String, srcCol: String,
      textCol: String, from: FromClause) extends Stmt

  /** `negatives <idCol>[,] <vecCol>[,] <labelCol> from <table>
    * [top <k>]` — hard-negative mining on the SQL surface (v37): per
    * query, the most-similar vectors of a DIFFERENT label via the
    * two-stage Hamming-shortlist → exact-cosine re-rank. */
  final case class NegativesStmt(idCol: String, vecCol: String,
      labelCol: String, from: FromClause, k: Long) extends Stmt

  /** `outliers <idCol>[,] <vecCol> from <table> [top <k>]` —
    * embedding OOD scoring on the SQL surface (v39): squared distance
    * to the nearest k-means centroid, the k farthest vectors. */
  final case class OutliersStmt(idCol: String, vecCol: String,
      from: FromClause, k: Long) extends Stmt

  /** `drift <vecCol> from <refTable> against <curTable>` — embedding
    * distribution drift on the SQL surface (x14): per-dimension PSI
    * of `cur` against the `ref` snapshot, with the 0.2 alert flag.
    * Emits (dim, psi, shifted). */
  final case class DriftStmt(vecCol: String, ref: FromClause,
      cur: FromClause) extends Stmt

  /** `epochs <srcCol>[,] <textCol> from <table> [budget <n>]` — the
    * p14 temperature-weighted epoch plan on the SQL surface: per
    * source, token count, target share, capped pass count, and
    * effective token contribution for a `budget`-token run. */
  final case class EpochsStmt(srcCol: String, textCol: String,
      from: FromClause, budget: Long) extends Stmt

  /** `retention <userCol>[,] <tsCol> from <table>` — e24's cohort
    * retention on the SQL surface: first-active-week cohorts × active
    * weeks. Emits (cohort, wk, week_idx, n_active). */
  final case class RetentionStmt(userCol: String, tsCol: String,
      from: FromClause) extends Stmt

  /** `diff <textCol> from <oldTable> against <newTable>` — d20's
    * corpus snapshot diff on the SQL surface (the drift two-table
    * shape): fingerprint-keyed added/removed/retained rollup with doc
    * and char volumes; n_chars = octet_length(text) per side (byte
    * length is engine-portable; codepoint counts are not). */
  final case class DiffStmt(textCol: String, old: FromClause,
      cur: FromClause) extends Stmt

  /** `fertility <langCol>[,] <textCol> from <table>` — t44's
    * per-language tokenizer-pressure profile on the SQL surface:
    * docs/words/subwords, fertility (subwords per word), chars per
    * subword. */
  final case class FertilityStmt(langCol: String, textCol: String,
      from: FromClause) extends Stmt

  /** `packing <idCol>[,] <textCol> from <table> [sizes <n>[, <n>…]]`
    * — t45's pack-efficiency curve on the SQL surface: bins,
    * straddlers, and fill rate per candidate context length from ONE
    * distributed cumsum. */
  final case class PackingStmt(idCol: String, textCol: String,
      from: FromClause, sizes: Seq[Long]) extends Stmt

  /** `trend <tsCol>[,] <keyCol> from <table> [top <k>]` — e21's
    * trending on the SQL surface: the top-k key values of every
    * 2h/1h sliding window by event count. Emits
    * (ws, event_type, n, rk) with `rk <= k` per window (k defaults
    * to 3); the ranking window runs over the already-aggregated
    * (windows × keys)-sized frame, never the rows. */
  final case class TrendStmt(tsCol: String, keyCol: String,
      from: FromClause, k: Long = 3L) extends Stmt

  /** `quantize <idCol>[,] <vecCol> from <table>` — v25's binary
    * (sign-bit) quantization on the SQL surface: the first 64 dims
    * packed as two BIGINT halves (code_lo dims 0-31, code_hi 32-63) —
    * 8 bytes per vector, Hamming-searchable with XOR+popcount. Emits
    * (vec_id, code_lo, code_hi); pure per-row fold, zero exchanges. */
  final case class QuantizeStmt(idCol: String, vecCol: String,
      from: FromClause) extends Stmt

  /** `repair <idCol>[,] <vecCol> from <table> [using '<path>']
    * [threshold <x>]` — v41's IVF index repair on the SQL surface:
    * cells whose refreshed centroid moved past `threshold` (squared
    * L2; default IVF_REPAIR_THRESH) have their vectors — and only
    * theirs — re-scored against the new centers, emitting the
    * (vec_id, cell_old, cell_new) move list an upserted index applies
    * in place instead of rebuilding. With `using '<path>'` the
    * membership comes from the persisted cell-partitioned index at
    * that path (the `index` statement's layout): the dirty set
    * becomes a static partition predicate and repair READS only
    * dirty cells' files. */
  final case class RepairStmt(idCol: String, vecCol: String,
      from: FromClause, thresh: Double,
      indexPath: Option[String] = None) extends Stmt

  /** `index <idCol>[,] <vecCol> from <table> [nh] into '<path>'` —
    * build + persist the IVF index as a CELL-PARTITIONED parquet
    * layout at `path` (the v45 storage shape): sample-bounded k-means
    * fit, one full assignment pass, hive-partitioned write. Emits the
    * per-cell build report (cell, n_vecs). EAGER like `cluster` (the
    * write runs at plan time). */
  final case class IndexStmt(idCol: String, vecCol: String,
      from: FromClause, path: String, pq: Boolean = false) extends Stmt

  /** `ingest <idCol>[,] <vecCol> from <table> [nh] into '<path>'
    * [append]` — incremental ingest into the persisted index at
    * `path`: arrivals assign against the index's FROZEN serving
    * centers (read off the `_centers` sidecar — no fit, no index
    * scan) and land via the overwrite upsert (default: touched cells
    * rewrite, re-ingest is an update even across cells) or APPEND
    * (O(batch) new files at the next seq version — the scattered-
    * arrival path; `compact` later restores plain reads). Emits the
    * post-ingest (vec_id, cell) readback (version-resolved under
    * append). */
  final case class IngestStmt(idCol: String, vecCol: String,
      from: FromClause, path: String, append: Boolean = false) extends Stmt

  /** `compact '<path>' [files <n>]` (n defaults to 4) — index
    * maintenance after appends: rewrites cells whose file count
    * exceeds `n` or that hold superseded row versions, recomputes
    * their sidecar refresh means, clears the pending-appends flag.
    * Emits the post-compact per-cell occupancy `(cell, n_vecs)` read
    * off the updated sidecar — k driver rows, zero index scans beyond
    * the rewrite itself. */
  final case class CompactStmt(path: String, files: Long = 4L) extends Stmt

  /** `serve <idCol>[,] <vecCol> from '<path>' [query <table>]
    * [top <k>]` — partition-pruned ANN serving off the persisted
    * index at `path`. Without `query`, the demo panel is the indexed
    * vectors with id < 5 (the v45 contract, cells already on disk).
    * With `query <table>` (a registered table or a quoted file path),
    * an EXTERNAL batch is served: each query routes to its nearest
    * exact cell MEAN of the index (the same decimal means the repair
    * refresh computes — deterministic and oracle-mirrorable), the
    * probed-cell union becomes a static partition predicate, and only
    * those cells' files are read. Routing reads the index's
    * `_centers` sidecar (k·d driver rows — zero index scans before
    * the pruned gather). `probe n` (query batches only, default 1)
    * probes each query's n nearest cells — recall rises with n while
    * the gather stays pruned to the probed union. Emits
    * (q_id, n_id, sim, rank ≤ k). */
  final case class ServeStmt(idCol: String, vecCol: String,
      path: String, query: Option[String] = None, k: Long = 5L,
      probe: Long = 1L, pq: Boolean = false,
      shortlist: Long = 20L) extends Stmt

  /** `pack <idCol>[,] <textCol> from <table> [size <l>]` — t11's
    * GPT-style sequence packing on the SQL surface: corpus tokens
    * concatenated in id order, cut into `l`-token training sequences
    * (default 512). Emits (doc_id, n_tok, tok_start, first_bin,
    * last_bin). Distributed cumsum — never a single-partition
    * window. */
  final case class PackStmt(idCol: String, textCol: String,
      from: FromClause, l: Long = 512L) extends Stmt

  /** `chunk <idCol>[,] <textCol> from <table> [size <n>]
    * [overlap <m>]` — the t34 overlapping-window chunking on the SQL
    * surface (RAG-ingest prep): each doc is cut into `size`-token
    * windows advancing by `size − overlap` tokens (defaults 64/16;
    * overlap must be smaller than size). Emits
    * (doc_id, chunk_id, chunk_text, n_chunk_tokens); token-less docs
    * emit nothing. Pure per-row explode — zero exchanges. */
  final case class ChunkStmt(idCol: String, textCol: String,
      from: FromClause, size: Long = 64L, overlap: Long = 16L) extends Stmt

  /** `profile <table>` — the x03-shape per-column profile on the SQL
    * surface, generalized to ANY schema: one aggregation pass emits
    * (col_name, n, n_null, n_distinct, min_v, max_v, mean_v) per
    * column, numeric stats as DOUBLE (NULL for non-numerics). The
    * SUMMARIZE every ingest pipeline runs before trusting new data. */
  final case class ProfileStmt(from: FromClause) extends Stmt

  // ── query structure ─────────────────────────────────────────────────
  final case class SelectItem(expr: Expr, alias: Option[String])

  sealed trait JoinType
  case object InnerJoin extends JoinType
  case object LeftJoin extends JoinType

  /** One chained join: exactly one equality condition
    * (reference parser.go:583-585), aliases mandatory. */
  final case class JoinClause(
      table: String, alias: String, joinType: JoinType,
      sizeHint: Option[String], // sjoin | bjoin (reference parser.go:840-864)
      noHeader: Boolean,
      leftKey: Expr, rightKey: Expr)

  final case class FromClause(
      table: String, alias: Option[String], noHeader: Boolean,
      intColumns: Boolean, // `c` option: bare ints are column refs (reference utils.go:516-517)
      joins: Seq[JoinClause])

  /** `distinct [hidden] expr` in the select list (reference parser.go:243-252). */
  final case class DistinctClause(expr: Expr, hidden: Boolean)

  final case class Query(
      star: Boolean,
      items: Seq[SelectItem],
      distinct: Option[DistinctClause],
      from: FromClause,
      where: Option[Pred],
      groupBy: Seq[Expr],
      having: Option[Pred],
      orderBy: Option[Expr],
      orderAsc: Boolean, // dialect default is DESC (reference parser.go:928-948)
      limit: Option[Long]) extends Stmt
}
