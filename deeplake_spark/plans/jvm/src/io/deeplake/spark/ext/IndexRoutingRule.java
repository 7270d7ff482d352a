package io.deeplake.spark.ext;

import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.HashMap;
import java.util.List;
import java.util.Map;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.ArrayContains;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThan;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.In;
import org.apache.spark.sql.catalyst.expressions.LessThan;
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.Lower;
import org.apache.spark.sql.catalyst.expressions.StringSplit;
import org.apache.spark.sql.catalyst.plans.LeftSemi$;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.Join;
import org.apache.spark.sql.catalyst.plans.logical.JoinHint;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.execution.datasources.HadoopFsRelation;
import org.apache.spark.sql.execution.datasources.LogicalRelation;
import org.apache.spark.sql.functions;
import org.apache.spark.sql.types.Decimal;
import org.apache.spark.sql.types.StringType;

import scala.Option;

/**
 * Catalyst rule: route filters over REGISTERED datasets through their
 * persisted side-table indexes, so plain {@code spark.sql} users get the
 * same posting-table semijoins the TQL translator emits
 * (deeplake_spark/tql/translator.py _try_index_rewrite; reference behavior:
 * every query consults index_holder, cpp/query_core/index_holder.hpp:18-43).
 *
 * Matched shapes (each conjunct judged independently; unmatched conjuncts
 * stay in a residual Filter):
 *
 * <ul>
 *  <li>{@code array_contains(split(lower(col), '\\s+'), 'kw')} on a column
 *      with an inverted index &rarr; posting probe (term-bucket pruned)
 *      semijoined on the row-id column. This is the Spark-SQL spelling of
 *      TQL's token-level CONTAINS; Spark's substring {@code contains()} is
 *      deliberately NOT routed &mdash; a token index cannot answer substring
 *      semantics and the rewrite must be exact, never approximate.</li>
 *  <li>comparisons / BETWEEN (parsed to &ge; + &le;) / IN / = on a column
 *      with a numeric index &rarr; range-bucket-pruned value probe.</li>
 * </ul>
 *
 * Safety: the rule no-ops unless {@code spark.sql.deeplake.routing.enabled}
 * is true AND the registry is non-empty, never rewrites when the row-id
 * column is absent from the relation, and any internal error falls back to
 * the untouched plan (routing must never break planning). Works both as a
 * resolution rule (SparkSessionExtensions path, pre-pushdown shape
 * Filter&rarr;SubqueryAlias&rarr;Relation) and as an extraOptimizations rule
 * (runtime install, post-pushdown shape Filter&rarr;Relation).
 */
public class IndexRoutingRule extends Rule<LogicalPlan> {

    public static final String ENABLED_KEY = "spark.sql.deeplake.routing.enabled";

    /** re-entrancy guard: probe plans are themselves analyzed/optimized. */
    private static final ThreadLocal<Boolean> IN_REWRITE =
            ThreadLocal.withInitial(() -> Boolean.FALSE);

    private final SparkSession session;

    public IndexRoutingRule(SparkSession session) {
        this.session = session;
    }

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        if (IndexRegistry.isEmpty() || IN_REWRITE.get()) {
            return plan;
        }
        try {
            if (!"true".equalsIgnoreCase(
                    session.conf().get(ENABLED_KEY, "false"))) {
                return plan;
            }
            IN_REWRITE.set(Boolean.TRUE);
            return rewrite(plan);
        } catch (Throwable t) {
            return plan;
        } finally {
            IN_REWRITE.set(Boolean.FALSE);
        }
    }

    private LogicalPlan rewrite(LogicalPlan plan) {
        List<LogicalPlan> kids = new ArrayList<>();
        boolean changed = false;
        scala.collection.Iterator<LogicalPlan> it = plan.children().iterator();
        while (it.hasNext()) {
            LogicalPlan c = it.next();
            LogicalPlan r = rewrite(c);
            changed |= (r != c);
            kids.add(r);
        }
        LogicalPlan node = changed ? plan.withNewChildren(toSeq(kids)) : plan;
        if (node instanceof Filter) {
            LogicalPlan routed = tryRoute((Filter) node);
            if (routed != null) {
                return routed;
            }
        }
        return node;
    }

    // ------------------------------------------------------------------

    private LogicalPlan tryRoute(Filter f) {
        if (!f.resolved()) {
            return null;
        }
        LogicalPlan child = f.child();
        LogicalPlan base = child;
        // descend to the scan through name-preserving wrappers only:
        // aliases, views, and PURE attribute projections (a Project that
        // computes or renames could shadow an indexed column's name and
        // make name-based matching unsound)
        while (true) {
            if (base instanceof SubqueryAlias) {
                base = ((SubqueryAlias) base).child();
            } else if (base instanceof org.apache.spark.sql.catalyst.plans.logical.View) {
                base = ((org.apache.spark.sql.catalyst.plans.logical.View) base).child();
            } else if (base instanceof org.apache.spark.sql.catalyst.plans.logical.Project
                    && attributesOnly((org.apache.spark.sql.catalyst.plans.logical.Project) base)) {
                base = ((org.apache.spark.sql.catalyst.plans.logical.Project) base).child();
            } else {
                break;
            }
        }
        if (!(base instanceof LogicalRelation)) {
            return null;
        }
        Object rel = ((LogicalRelation) base).relation();
        if (!(rel instanceof HadoopFsRelation)) {
            return null;
        }
        List<String> paths = new ArrayList<>();
        scala.collection.Iterator<org.apache.hadoop.fs.Path> pit =
                ((HadoopFsRelation) rel).location().rootPaths().iterator();
        while (pit.hasNext()) {
            paths.add(pit.next().toString());
        }
        Map<String, IndexRegistry.Entry> byCol = IndexRegistry.lookupByPaths(paths);
        if (byCol == null) {
            return null;
        }

        List<Expression> residual = new ArrayList<>();
        List<Dataset<Row>> probes = new ArrayList<>();
        List<String> probeIdCols = new ArrayList<>();
        Map<String, Range> ranges = new HashMap<>();

        scala.collection.Iterator<Expression> cit =
                f.splitConjunctivePredicates(f.condition()).iterator();
        while (cit.hasNext()) {
            Expression c = cit.next();
            String[] tok = matchTokenContains(c);
            if (tok != null) {
                IndexRegistry.Entry en = byCol.get(tok[0]);
                if (en != null && "inverted".equals(en.kind)
                        && hasAttr(child, en.idCol)) {
                    probes.add(invertedProbe(en, tok[1]));
                    probeIdCols.add(en.idCol);
                    continue;
                }
            }
            String[] eqs = matchStringEquality(c);
            if (eqs != null) {
                IndexRegistry.Entry en = byCol.get(eqs[0]);
                if (en != null && "exact".equals(en.kind)
                        && hasAttr(child, en.idCol)) {
                    probes.add(exactProbe(en, eqs[1]));
                    probeIdCols.add(en.idCol);
                    continue;
                }
            }
            InMatch in = matchIn(c);
            if (in != null) {
                IndexRegistry.Entry en = byCol.get(in.column);
                if (en != null && "numeric".equals(en.kind)
                        && hasAttr(child, en.idCol)) {
                    probes.add(inProbe(en, in.values));
                    probeIdCols.add(en.idCol);
                    continue;
                }
            }
            Bound[] bt = matchBetween(c);
            if (bt != null) {
                IndexRegistry.Entry en = byCol.get(bt[0].column);
                if (en != null && "numeric".equals(en.kind)
                        && hasAttr(child, en.idCol)) {
                    Range r = ranges.computeIfAbsent(bt[0].column,
                            k -> new Range(en));
                    r.add(bt[0]);
                    r.add(bt[1]);
                    continue;
                }
            }
            Bound b = matchComparison(c);
            if (b != null) {
                IndexRegistry.Entry en = byCol.get(b.column);
                if (en != null && "numeric".equals(en.kind)
                        && hasAttr(child, en.idCol)) {
                    ranges.computeIfAbsent(b.column, k -> new Range(en))
                            .add(b);
                    continue;
                }
            }
            residual.add(c);
        }
        for (Range r : ranges.values()) {
            probes.add(rangeProbe(r));
            probeIdCols.add(r.entry.idCol);
        }
        if (probes.isEmpty()) {
            return null;
        }

        LogicalPlan joined = child;
        for (int i = 0; i < probes.size(); i++) {
            Attribute idAttr = findAttr(child.output(), probeIdCols.get(i));
            if (idAttr == null) {
                return null;
            }
            LogicalPlan probePlan =
                    probes.get(i).queryExecution().optimizedPlan();
            Attribute probeAttr = findAttr(probePlan.output(), "row_id");
            if (probeAttr == null) {
                return null;
            }
            joined = new Join(joined, probePlan, LeftSemi$.MODULE$,
                    Option.apply(new EqualTo(idAttr, probeAttr)),
                    JoinHint.NONE());
        }
        if (residual.isEmpty()) {
            return joined;
        }
        Expression cond = residual.get(0);
        for (int i = 1; i < residual.size(); i++) {
            cond = new And(cond, residual.get(i));
        }
        return new Filter(cond, joined);
    }

    // ----------------------------------------------------- probe builders

    /** filter(term = kw) over the bucket-partitioned postings, pruned to
     *  the keyword's bucket with the same hash the build used. */
    private Dataset<Row> invertedProbe(IndexRegistry.Entry en, String kw) {
        Dataset<Row> p = session.read().parquet(en.indexPath + "/postings");
        if (Arrays.asList(p.columns()).contains("bucket")) {
            Column b = functions.abs(functions.hash(functions.lit(kw)))
                    .mod(functions.lit(64));
            p = p.filter(functions.col("bucket").equalTo(b));
        }
        return p.filter(functions.col("term").equalTo(functions.lit(kw)))
                .select("row_id").distinct();
    }

    /** whole-string equality via the exact-text index: md5-hex digest
     *  lookup, pruned to the 2-char digest-prefix partition (the same
     *  digest-only semantics as the Python probe / the reference's
     *  index_search.cpp:172-199 hash lookup). */
    private Dataset<Row> exactProbe(IndexRegistry.Entry en, String value) {
        String hex;
        try {
            java.security.MessageDigest md =
                    java.security.MessageDigest.getInstance("MD5");
            StringBuilder sb = new StringBuilder();
            for (byte b : md.digest(
                    value.getBytes(java.nio.charset.StandardCharsets.UTF_8))) {
                sb.append(String.format("%02x", b));
            }
            hex = sb.toString();
        } catch (java.security.NoSuchAlgorithmException e) {
            throw new IllegalStateException(e);
        }
        Dataset<Row> d = session.read().parquet(en.indexPath + "/digests");
        if (Arrays.asList(d.columns()).contains("bucket")) {
            d = d.filter(functions.col("bucket")
                    .equalTo(hex.substring(0, 2)));
        }
        return d.filter(functions.col("digest").equalTo(hex))
                .select("row_id").distinct();
    }

    private Dataset<Row> inProbe(IndexRegistry.Entry en, List<Object> values) {
        Dataset<Row> v = session.read().parquet(en.indexPath + "/values");
        double[] meta = readMeta(en.indexPath);
        if (meta != null && Arrays.asList(v.columns()).contains("bucket")) {
            List<Object> buckets = new ArrayList<>();
            for (Object o : values) {
                Object b = bucketOf(((Number) o).doubleValue(), meta);
                if (!buckets.contains(b)) {
                    buckets.add(b);
                }
            }
            v = v.filter(functions.col("bucket").isin(buckets.toArray()));
        }
        return v.filter(functions.col("value").isin(values.toArray()))
                .select("row_id").distinct();
    }

    private Dataset<Row> rangeProbe(Range r) {
        Dataset<Row> v = session.read().parquet(r.entry.indexPath + "/values");
        double[] meta = readMeta(r.entry.indexPath);
        boolean hasBucket = Arrays.asList(v.columns()).contains("bucket");
        if (meta != null && hasBucket) {
            if (r.lo != null) {
                v = v.filter(functions.col("bucket")
                        .geq(bucketOf(r.lo.doubleValue(), meta)));
            }
            if (r.hi != null) {
                v = v.filter(functions.col("bucket")
                        .leq(bucketOf(r.hi.doubleValue(), meta)));
            }
        }
        if (r.lo != null) {
            Column c = functions.col("value");
            v = v.filter(r.loStrict ? c.gt(functions.lit(r.lo))
                    : c.geq(functions.lit(r.lo)));
        }
        if (r.hi != null) {
            Column c = functions.col("value");
            v = v.filter(r.hiStrict ? c.lt(functions.lit(r.hi))
                    : c.leq(functions.lit(r.hi)));
        }
        return v.select("row_id").distinct();
    }

    private static int bucketOf(double v, double[] meta) {
        double vmin = meta[0];
        double width = meta[1] == 0.0 ? 1.0 : meta[1];
        int b = (int) Math.floor((v - vmin) / width);
        return Math.max(0, Math.min(63, b));
    }

    private static final Pattern VMIN =
            Pattern.compile("\"vmin\"\\s*:\\s*(-?[0-9.eE+]+)");
    private static final Pattern WIDTH =
            Pattern.compile("\"width\"\\s*:\\s*(-?[0-9.eE+]+)");

    private static double[] readMeta(String indexPath) {
        try {
            String txt = new String(Files.readAllBytes(
                    Paths.get(IndexRegistry.normalize(indexPath), "meta.json")));
            Matcher mv = VMIN.matcher(txt);
            Matcher mw = WIDTH.matcher(txt);
            if (mv.find() && mw.find()) {
                return new double[]{Double.parseDouble(mv.group(1)),
                        Double.parseDouble(mw.group(1))};
            }
        } catch (Exception ignored) {
            // sidecar missing: probe stays exact, just unpruned
        }
        return null;
    }

    // -------------------------------------------------- pattern matchers

    /** array_contains(split(lower(attr), '\\s+'), 'kw') -> {col, kw}. */
    private static String[] matchTokenContains(Expression e) {
        if (!(e instanceof ArrayContains)) {
            return null;
        }
        ArrayContains ac = (ArrayContains) e;
        String kw = stringLit(ac.right());
        // uppercase or whitespace keywords can never match lower()-ed
        // whitespace tokens; leave such predicates untouched
        if (kw == null || kw.isEmpty() || !kw.equals(kw.toLowerCase())
                || kw.matches(".*\\s.*")) {
            return null;
        }
        if (!(ac.left() instanceof StringSplit)) {
            return null;
        }
        StringSplit sp = (StringSplit) ac.left();
        if (!"\\s+".equals(stringLit(sp.regex()))) {
            return null;
        }
        // a bounded split (limit > 0) produces different tokens than the
        // index's tokenizer — only the unlimited form is routable
        Number lim = numLit(sp.limit());
        if (lim == null || lim.intValue() != -1) {
            return null;
        }
        if (!(sp.str() instanceof Lower)) {
            return null;
        }
        Expression a = ((Lower) sp.str()).child();
        if (!(a instanceof AttributeReference)) {
            return null;
        }
        return new String[]{((AttributeReference) a).name(), kw};
    }

    private static final class Bound {
        String column;
        Number value;
        boolean isLow;
        boolean strict;
        boolean eq;
    }

    /** strip a no-op cast (same source/target type) around an attr:
     *  type coercion inserts them (e.g. cast(n_chars as bigint) IN ...). */
    private static Expression stripNoopCast(Expression e) {
        if (e instanceof org.apache.spark.sql.catalyst.expressions.Cast) {
            Expression c = ((org.apache.spark.sql.catalyst.expressions.Cast) e)
                    .child();
            if (c.dataType().equals(e.dataType())) {
                return c;
            }
        }
        return e;
    }

    /** BETWEEN parses to a RuntimeReplaceable Between(input, lo, hi)
     *  node at analysis time (replaced only later in the optimizer). */
    private static Bound[] matchBetween(Expression e) {
        if (!(e instanceof org.apache.spark.sql.catalyst.expressions.Between)) {
            return null;
        }
        org.apache.spark.sql.catalyst.expressions.Between bt =
                (org.apache.spark.sql.catalyst.expressions.Between) e;
        Expression in = stripNoopCast(bt.input());
        Number lo = numLit(bt.lower());
        Number hi = numLit(bt.upper());
        if (!(in instanceof AttributeReference) || lo == null || hi == null) {
            return null;
        }
        String col = ((AttributeReference) in).name();
        Bound l = new Bound();
        l.column = col;
        l.value = lo;
        l.isLow = true;
        Bound h = new Bound();
        h.column = col;
        h.value = hi;
        h.isLow = false;
        return new Bound[]{l, h};
    }

    /** one side attr, other side foldable numeric; >=, >, <=, <, =. */
    private static Bound matchComparison(Expression e) {
        Expression l;
        Expression r;
        boolean low;       // when attr is on the LEFT
        boolean strict;
        boolean eq = false;
        if (e instanceof GreaterThanOrEqual) {
            l = ((GreaterThanOrEqual) e).left();
            r = ((GreaterThanOrEqual) e).right();
            low = true;
            strict = false;
        } else if (e instanceof GreaterThan) {
            l = ((GreaterThan) e).left();
            r = ((GreaterThan) e).right();
            low = true;
            strict = true;
        } else if (e instanceof LessThanOrEqual) {
            l = ((LessThanOrEqual) e).left();
            r = ((LessThanOrEqual) e).right();
            low = false;
            strict = false;
        } else if (e instanceof LessThan) {
            l = ((LessThan) e).left();
            r = ((LessThan) e).right();
            low = false;
            strict = true;
        } else if (e instanceof EqualTo) {
            l = ((EqualTo) e).left();
            r = ((EqualTo) e).right();
            low = true;
            strict = false;
            eq = true;
        } else {
            return null;
        }
        l = stripNoopCast(l);
        r = stripNoopCast(r);
        AttributeReference attr;
        Number val;
        if (l instanceof AttributeReference && (val = numLit(r)) != null) {
            attr = (AttributeReference) l;
        } else if (r instanceof AttributeReference && (val = numLit(l)) != null) {
            attr = (AttributeReference) r;
            low = !low;                 // 5 <= x is a LOWER bound on x
        } else {
            return null;
        }
        Bound b = new Bound();
        b.column = attr.name();
        b.value = val;
        b.isLow = low;
        b.strict = strict;
        b.eq = eq;                      // Range.add treats eq as lo == hi
        return b;
    }

    /** col = 'literal' (either side) on a string column -> {col, value}. */
    private static String[] matchStringEquality(Expression e) {
        if (!(e instanceof EqualTo)) {
            return null;
        }
        Expression l = stripNoopCast(((EqualTo) e).left());
        Expression r = stripNoopCast(((EqualTo) e).right());
        String v;
        if (l instanceof AttributeReference
                && l.dataType() instanceof StringType
                && (v = stringLit(r)) != null) {
            return new String[]{((AttributeReference) l).name(), v};
        }
        if (r instanceof AttributeReference
                && r.dataType() instanceof StringType
                && (v = stringLit(l)) != null) {
            return new String[]{((AttributeReference) r).name(), v};
        }
        return null;
    }

    private static final class InMatch {
        String column;
        List<Object> values;
    }

    private static InMatch matchIn(Expression e) {
        if (!(e instanceof In)) {
            return null;
        }
        In in = (In) e;
        Expression v = stripNoopCast(in.value());
        if (!(v instanceof AttributeReference)) {
            return null;
        }
        List<Object> vals = new ArrayList<>();
        scala.collection.Iterator<Expression> it = in.list().iterator();
        while (it.hasNext()) {
            Number n = numLit(it.next());
            if (n == null) {
                return null;
            }
            vals.add(n);
        }
        InMatch m = new InMatch();
        m.column = ((AttributeReference) v).name();
        m.values = vals;
        return m;
    }

    private final class Range {
        final IndexRegistry.Entry entry;
        Number lo;
        Number hi;
        boolean loStrict;
        boolean hiStrict;

        Range(IndexRegistry.Entry entry) {
            this.entry = entry;
        }

        void add(Bound b) {
            if (b.eq) {
                tightenLo(b.value, false);
                tightenHi(b.value, false);
            } else if (b.isLow) {
                tightenLo(b.value, b.strict);
            } else {
                tightenHi(b.value, b.strict);
            }
        }

        private void tightenLo(Number v, boolean strict) {
            if (lo == null || v.doubleValue() > lo.doubleValue()) {
                lo = v;
                loStrict = strict;
            } else if (v.doubleValue() == lo.doubleValue()) {
                loStrict = loStrict || strict;
            }
        }

        private void tightenHi(Number v, boolean strict) {
            if (hi == null || v.doubleValue() < hi.doubleValue()) {
                hi = v;
                hiStrict = strict;
            } else if (v.doubleValue() == hi.doubleValue()) {
                hiStrict = hiStrict || strict;
            }
        }
    }

    // ------------------------------------------------------------ helpers

    private static String stringLit(Expression e) {
        if (!(e.foldable() && e.dataType() instanceof StringType)) {
            return null;
        }
        Object v = e.eval(null);
        return v == null ? null : v.toString();
    }

    private static Number numLit(Expression e) {
        if (!e.foldable() || e instanceof AttributeReference) {
            return null;
        }
        Object v;
        try {
            v = e.eval(null);
        } catch (Exception ex) {
            return null;
        }
        if (v instanceof Decimal) {
            return ((Decimal) v).toJavaBigDecimal();
        }
        return v instanceof Number ? (Number) v : null;
    }

    private static boolean attributesOnly(
            org.apache.spark.sql.catalyst.plans.logical.Project p) {
        scala.collection.Iterator<
                org.apache.spark.sql.catalyst.expressions.NamedExpression> it =
                p.projectList().iterator();
        while (it.hasNext()) {
            if (!(it.next() instanceof AttributeReference)) {
                return false;
            }
        }
        return true;
    }

    private static boolean hasAttr(LogicalPlan plan, String name) {
        return findAttr(plan.output(), name) != null;
    }

    private static Attribute findAttr(
            scala.collection.immutable.Seq<Attribute> out, String name) {
        scala.collection.Iterator<Attribute> it = out.iterator();
        while (it.hasNext()) {
            Attribute a = it.next();
            if (a.name().equalsIgnoreCase(name)) {
                return a;
            }
        }
        return null;
    }

    private static <T> scala.collection.immutable.Seq<T> toSeq(List<T> l) {
        return scala.jdk.javaapi.CollectionConverters.asScala(l).toSeq();
    }
}
