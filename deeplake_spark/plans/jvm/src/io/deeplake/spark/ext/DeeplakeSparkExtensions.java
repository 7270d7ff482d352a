package io.deeplake.spark.ext;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * SparkSessionExtensions entry point (SURVEY §7 Phase-4):
 *
 * <pre>
 *   --conf spark.jars=.../deeplake-spark-ext.jar
 *   --conf spark.sql.extensions=io.deeplake.spark.ext.DeeplakeSparkExtensions
 * </pre>
 *
 * Injects {@link IndexRoutingRule} as a RESOLUTION rule so the rewrite sees
 * the pre-pushdown plan (Filter above the relation with every column - the
 * row-id column included - still in scope), and the regular optimizer then
 * pushes/prunes through the spliced semijoin. The rule is double-gated:
 * inert until the runtime conf {@code spark.sql.deeplake.routing.enabled}
 * is set AND something is registered, so a session built with this
 * extension behaves stock by default.
 */
public class DeeplakeSparkExtensions
        extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

    @Override
    public BoxedUnit apply(SparkSessionExtensions ext) {
        ext.injectResolutionRule(
                new AbstractFunction1<SparkSession, Rule<LogicalPlan>>() {
                    @Override
                    public Rule<LogicalPlan> apply(SparkSession session) {
                        return new IndexRoutingRule(session);
                    }
                });
        return BoxedUnit.UNIT;
    }
}
