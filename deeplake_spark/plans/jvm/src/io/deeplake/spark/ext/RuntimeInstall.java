package io.deeplake.spark.ext;

import java.util.ArrayList;
import java.util.List;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

/**
 * Late install for an ALREADY-BUILT session (extensions only load at
 * session construction): appends {@link IndexRoutingRule} to
 * {@code session.experimental().extraOptimizations()}. There the rule runs
 * post-pushdown (Filter directly above the relation), which the rule also
 * handles - broader, in fact: pushed-down filters from join queries match
 * too. Idempotent.
 */
public final class RuntimeInstall {

    private RuntimeInstall() {}

    public static void install(SparkSession session) {
        scala.collection.Seq<Rule<LogicalPlan>> cur =
                session.experimental().extraOptimizations();
        List<Rule<LogicalPlan>> rules = new ArrayList<>(
                scala.jdk.javaapi.CollectionConverters.asJava(cur));
        for (Rule<LogicalPlan> r : rules) {
            if (r instanceof IndexRoutingRule) {
                return;
            }
        }
        rules.add(new IndexRoutingRule(session));
        session.experimental().extraOptimizations_$eq(
                scala.jdk.javaapi.CollectionConverters.asScala(rules).toSeq());
    }

    public static void uninstall(SparkSession session) {
        scala.collection.Seq<Rule<LogicalPlan>> cur =
                session.experimental().extraOptimizations();
        List<Rule<LogicalPlan>> rules = new ArrayList<>();
        for (Rule<LogicalPlan> r :
                scala.jdk.javaapi.CollectionConverters.asJava(cur)) {
            if (!(r instanceof IndexRoutingRule)) {
                rules.add(r);
            }
        }
        session.experimental().extraOptimizations_$eq(
                scala.jdk.javaapi.CollectionConverters.asScala(rules).toSeq());
    }
}
